"""Mesh-sharded multi-stream video serving.

The reference serves exactly one video per GPU process (mmtrack selsa.py
hard-requires ``samples_per_gpu == 1``; scale-out is one DDP process per
stream over NCCL, `mmtracking/tools/dist_test.sh`). The TPU-first design
instead shards a batch of S independent streams over the chips of a
``jax.sharding.Mesh``: one compiled step serves S streams per dispatch, each
chip running S/n_devices of them — the same ``inference_clip_batch``
(models/vid/selsa.py) program, with the stream axis laid out over the mesh's
'data' axis so there is NO cross-chip communication on the serving path
(streams are independent; XLA inserts zero collectives).

Weights are replicated; the carried ``VideoState`` memo is sharded on its
leading stream axis and donated (the ~35 MB/stream K/V memo never leaves its
chip or gets copied).

Validated on the driver's virtual CPU mesh (tests/test_parallel_serve.py)
exactly like the training path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vid.selsa import (
    VideoState,
    empty_video_state,
    inference_clip_batch,
    inference_step,
)
from .train import create_mesh


def batched_video_state(cfg, n_streams: int, rng=None) -> VideoState:
    """An S-stream empty memo: leading stream axis on every leaf."""
    st = empty_video_state(cfg, rng=rng)
    tile = lambda a: jnp.broadcast_to(a[None], (n_streams,) + a.shape)
    return VideoState(
        ref_kv=tuple((tile(k), tile(v)) for k, v in st.ref_kv),
        ref_valid=tile(st.ref_valid),
        next_slot=jnp.zeros((n_streams,), jnp.int32),
        ref_maps=(tile(st.ref_maps) if st.ref_maps is not None else None),
    )


def make_serve_step(model, mesh: Optional[Mesh] = None, clip: bool = True,
                    update_memo: bool = False, frame_stride: int = 1):
    """Compile a mesh-sharded S-stream serving step.

    Returns (step, shard_args) where
      ``step(params, anchors, states, frames, img_shapes, scale_factors)``
    runs ``inference_clip_batch`` (clip=True; frames [S, T, ...]) or a
    vmapped single-frame ``inference_step`` (clip=False; frames [S, ...])
    with the stream axis sharded over the mesh's 'data' axis, params/anchors
    replicated, and the carried states donated. ``shard_args`` places a
    (params, anchors, states, frames, shapes, sfs) tuple onto the mesh with
    those layouts (call it once on host-built inputs; the step keeps
    shardings stable thereafter).

    S must be a multiple of mesh.devices.size.
    """
    mesh = mesh or create_mesh()
    repl = NamedSharding(mesh, P())
    stream = NamedSharding(mesh, P("data"))

    def fn(params, anchors, states, frames, img_shapes, scale_factors):
        if clip:
            return inference_clip_batch(
                model, params, states, frames, img_shapes, scale_factors,
                anchors, update_memo=update_memo, frame_stride=frame_stride)

        def one(st, fr, ishape, sf):
            return inference_step(
                model, params, st, fr, ishape, sf, anchors,
                update_memo=update_memo)

        return jax.vmap(one)(states, frames, img_shapes, scale_factors)

    shard_leaf = lambda s: lambda x: jax.device_put(x, s)
    step = jax.jit(
        fn,
        in_shardings=(repl, repl, stream, stream, stream, stream),
        out_shardings=(stream, stream),
        donate_argnums=(2,),
    )

    def shard_args(params, anchors, states, frames, img_shapes,
                   scale_factors):
        return (
            jax.tree.map(shard_leaf(repl), params),
            jax.device_put(anchors, repl),
            jax.tree.map(shard_leaf(stream), states),
            jax.device_put(frames, stream),
            jax.device_put(img_shapes, stream),
            jax.device_put(scale_factors, stream),
        )

    return step, shard_args
