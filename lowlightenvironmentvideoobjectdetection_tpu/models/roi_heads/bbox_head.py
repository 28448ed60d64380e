"""Second-stage bbox head: Shared2FC (+ optional SELSA aggregation) and its
target/loss/decode machinery.

Parity targets in the reference:
- Shared2FCBBoxHead: mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py:177
  (flatten -> fc1024 -> relu -> fc1024 -> relu -> cls/reg linears).
- SelsaBBoxHead: mmtracking/mmtrack/models/roi_heads/bbox_heads/
  selsa_bbox_head.py:8 (x = x + aggregator_i(x, ref_x) after each shared fc).
- targets/loss: mmdet bbox_head.py:13 — CE over C+1 (background = C) +
  SmoothL1(beta=1) on the matched class's deltas, stds (0.2,)*4.
- decode: delta2bbox per class + multiclass_nms (score_thr 1e-4, iou .5,
  max 100) — fixed-shape here.

TPU-first: the reference bbox head recomputes the reference-frame path
(fc_i(ref_x)) on *every* streamed frame even though it is independent of the
key frame. Here ``ref_transform`` exposes exactly those per-FC reference
activations so the streaming memo caches them once per reference frame, and
``forward_cached`` consumes the cache — removing ~14 redundant ResNet+FC ref
passes per frame at test time.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import assigners, boxes as box_ops, losses, nms as nms_ops
from ..aggregators.selsa_aggregator import SelsaAggregator

BBOX_STDS = (0.2, 0.2, 0.2, 0.2)


class Shared2FCBBoxHead(nn.Module):
    """Two shared FCs then cls/reg linears; optional per-FC SELSA aggregator."""

    num_classes: int = 30
    fc_out_channels: int = 1024
    num_shared_fcs: int = 2
    with_selsa: bool = False
    num_attention_blocks: int = 16
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.shared_fcs = [
            nn.Dense(self.fc_out_channels, dtype=self.dtype, name=f"shared_fc{i}")
            for i in range(self.num_shared_fcs)
        ]
        if self.with_selsa:
            self.aggregators = [
                SelsaAggregator(
                    in_channels=self.fc_out_channels,
                    num_attention_blocks=self.num_attention_blocks,
                    dtype=self.dtype,
                    name=f"aggregator{i}",
                )
                for i in range(self.num_shared_fcs)
            ]
        self.fc_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        self.fc_reg = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")

    def _heads(self, x):
        return self.fc_cls(x), self.fc_reg(x)

    def __call__(
        self,
        x: jnp.ndarray,
        ref_x: Optional[jnp.ndarray] = None,
        ref_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Joint forward. x: [N, 7, 7, C] (or [N, D]); ref_x: [M, 7, 7, C]
        (SELSA). Returns (cls_score [N, C+1], bbox_pred)."""
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        if ref_x is not None:
            ref_x = ref_x.reshape(ref_x.shape[0], -1).astype(self.dtype)
        for i, fc in enumerate(self.shared_fcs):
            x = fc(x)
            if self.with_selsa:
                assert ref_x is not None
                ref_x = fc(ref_x)
                x = x + self.aggregators[i](x, ref_x, ref_mask)
                ref_x = nn.relu(ref_x)
            x = nn.relu(x)
        return self._heads(x)

    def ref_transform(self, ref_x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Reference-side activations consumed by each aggregator: stage i is
        fc_i(·) *pre-relu*, exactly as in the joint forward."""
        ref_x = ref_x.reshape(ref_x.shape[0], -1).astype(self.dtype)
        stages = []
        for fc in self.shared_fcs:
            ref_x = fc(ref_x)
            stages.append(ref_x)
            ref_x = nn.relu(ref_x)
        return tuple(stages)

    def forward_cached(
        self,
        x: jnp.ndarray,
        ref_stages: Sequence[jnp.ndarray],
        ref_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Key-frame forward against cached ``ref_transform`` outputs."""
        assert self.with_selsa
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        for i, fc in enumerate(self.shared_fcs):
            x = fc(x)
            x = x + self.aggregators[i](x, ref_stages[i], ref_mask)
            x = nn.relu(x)
        return self._heads(x)

    def forward_cached_stream(
        self,
        x: jnp.ndarray,
        ref_stages: Sequence[jnp.ndarray],
        ref_mask: jnp.ndarray,
        self_mask: jnp.ndarray,
    ):
        """Streaming forward: attends over cached ref activations PLUS this
        frame's own rois (reference selsa.py:222-223/:256 concatenates the
        current frame into the ref set), and returns the frame's ref-side
        activations for the memo — with NO extra stage-1 matmul: the
        25088->1024 fc output is shared between the key path and the
        ref-side stage-1 activation (they are identical by construction;
        only later stages diverge, where the key path adds the aggregation
        residual before the relu while the ref path does not).

        Returns ((cls, reg), cur_stages).
        """
        assert self.with_selsa
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        cur_stages = []
        r = None
        for i, fc in enumerate(self.shared_fcs):
            xf = fc(x)
            cur = xf if i == 0 else fc(r)  # ref-side activation, pre-relu
            cur_stages.append(cur)
            r = nn.relu(cur)
            refs = jnp.concatenate(
                [ref_stages[i].astype(cur.dtype), cur], axis=0)
            mask = jnp.concatenate([ref_mask, self_mask])
            x = xf + self.aggregators[i](xf, refs, mask)
            x = nn.relu(x)
        return self._heads(x), tuple(cur_stages)

    def ref_transform_kv(self, ref_x: jnp.ndarray):
        """Reference-side cached K/V per shared-FC stage: the aggregator's
        ref projections (ref_fc_embed / ref_fc) of the pre-relu activations.
        Returns a tuple over stages of (k [nb, M, hd], v [nb, M, hd]) —
        head-major, the fused attention kernel's native operand layout: what
        the streaming memo stores, so per-frame attention reads projections
        directly (no re-projection, no transpose) every frame."""
        ref_x = ref_x.reshape(ref_x.shape[0], -1).astype(self.dtype)
        kvs = []
        for i, fc in enumerate(self.shared_fcs):
            ref_x = fc(ref_x)
            kvs.append(self.aggregators[i].project_kv_hm(ref_x))
            ref_x = nn.relu(ref_x)
        return tuple(kvs)

    def forward_cached_stream_kv(
        self,
        x: jnp.ndarray,
        ref_kvs,
        ref_mask: jnp.ndarray,
        self_mask: jnp.ndarray,
    ):
        """KV-cached streaming forward (same math as
        ``forward_cached_stream``, faster memory layout): attends over cached
        ref K/V plus this frame's own projected rois, via the fused Pallas
        attention on TPU. Returns ((cls, reg), cur_kvs) where ``cur_kvs`` is
        this frame's per-stage (k, v) for the fix-stride memo roll."""
        assert self.with_selsa
        x4 = x.astype(self.dtype)
        x = x4.reshape(x4.shape[0], -1)
        cur_kvs = []
        r = None
        for i, fc in enumerate(self.shared_fcs):
            if i == 0 and x4.ndim == 4 and not self.is_initializing():
                # contract the [N, 7, 7, C] roi features directly against the
                # kernel viewed [7, 7, C, out] — the [N, 25088] flatten of
                # the chunked RoIAlign output is a real relayout copy on TPU
                # (~48 us/frame); dot_general fuses it into the matmul
                # (measured 142 -> 110 us for the first FC). Same [25088,
                # out] parameter, same row-major contraction order.
                p = self.shared_fcs[0].variables["params"]
                k0 = p["kernel"].astype(self.dtype).reshape(
                    x4.shape[1], x4.shape[2], x4.shape[3], -1)
                xf = jax.lax.dot_general(
                    x4, k0, (((1, 2, 3), (0, 1, 2)), ((), ())))
                xf = xf + p["bias"].astype(self.dtype)
            else:
                xf = fc(x)
            cur = xf if i == 0 else fc(r)  # ref-side activation, pre-relu
            r = nn.relu(cur)
            ck, cv = self.aggregators[i].project_kv_hm(cur)
            cur_kvs.append((ck, cv))
            q = self.aggregators[i].project_q(xf)
            # two-slab attention: memo K/V ++ this frame's K/V with joint
            # softmax, without materializing the concatenation
            x = xf + self.aggregators[i].attend_cached2(
                q, ref_kvs[i][0], ref_kvs[i][1], ck, cv, ref_mask, self_mask)
            x = nn.relu(x)
        return self._heads(x), tuple(cur_kvs)


class BBoxTargets(NamedTuple):
    rois: jnp.ndarray  # [num, 4] sampled proposals
    labels: jnp.ndarray  # [num] int32 (num_classes = background)
    label_weights: jnp.ndarray  # [num]
    bbox_targets: jnp.ndarray  # [num, 4]
    bbox_weights: jnp.ndarray  # [num]
    is_pos: jnp.ndarray  # [num] bool


def bbox_targets(
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    num_classes: int = 30,
    num_samples: int = 256,
    pos_fraction: float = 0.25,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.5,
    add_gt_as_proposals: bool = True,
    stds=BBOX_STDS,
) -> BBoxTargets:
    """Assign + sample proposals for the RoI head (single image)."""
    if add_gt_as_proposals:
        cand = jnp.concatenate([gt_boxes, proposals], axis=0)
        cand_valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)
    else:
        cand, cand_valid = proposals, proposal_valid

    assign = assigners.max_iou_assign(
        cand, gt_boxes, gt_labels, gt_valid,
        pos_iou_thr, neg_iou_thr, min_pos_iou, box_valid=cand_valid,
    )
    sample = assigners.random_sample_gather(assign, rng, num_samples, pos_fraction)
    rois = cand[sample.inds]
    s_assigned = assign.assigned_gt_inds[sample.inds]
    matched_gt_idx = jnp.clip(s_assigned - 1, 0, gt_boxes.shape[0] - 1)
    pos = sample.is_pos

    labels = jnp.where(pos, gt_labels[matched_gt_idx], num_classes).astype(jnp.int32)
    label_w = sample.is_valid.astype(jnp.float32)
    tgt = box_ops.bbox2delta(rois, gt_boxes[matched_gt_idx], stds=stds)
    tgt = jnp.where(pos[:, None], tgt, 0.0)
    return BBoxTargets(rois, labels, label_w, tgt, pos.astype(jnp.float32), pos)


class BBoxLossOut(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    acc: jnp.ndarray


def bbox_loss(
    cls_score: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    targets: BBoxTargets,
    num_classes: int = 30,
    reg_class_agnostic: bool = False,
) -> BBoxLossOut:
    avg = jnp.maximum(jnp.sum(targets.label_weights), 1.0)
    loss_cls = losses.softmax_cross_entropy(
        cls_score.astype(jnp.float32), targets.labels,
        weight=targets.label_weights, avg_factor=avg,
    )
    if reg_class_agnostic:
        pred = bbox_pred.astype(jnp.float32)
    else:
        pred = bbox_pred.reshape(-1, num_classes, 4).astype(jnp.float32)
        cls_idx = jnp.clip(targets.labels, 0, num_classes - 1)
        pred = jnp.take_along_axis(pred, cls_idx[:, None, None], axis=1)[:, 0]
    # the reference averages the reg loss by the total sample count as well
    loss_bbox = losses.smooth_l1_loss(
        pred, targets.bbox_targets, beta=1.0,
        weight=targets.bbox_weights[:, None], avg_factor=avg,
    )
    acc = losses.accuracy(
        cls_score.astype(jnp.float32), targets.labels, targets.label_weights
    )
    return BBoxLossOut(loss_cls, loss_bbox, acc)


def bbox_decode(
    rois: jnp.ndarray,
    cls_score: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    img_shape,
    roi_valid: Optional[jnp.ndarray] = None,
    scale_factor: Optional[jnp.ndarray] = None,
    score_thr: float = 1e-4,
    iou_threshold: float = 0.5,
    max_per_img: int = 100,
    stds=BBOX_STDS,
    nms_pre: Optional[int] = 2048,
) -> nms_ops.DetResult:
    """Decode head outputs into final fixed-shape detections (test time).

    ``nms_pre`` bounds the multiclass-NMS candidate window (N rois x C
    classes candidates, nearly all passing the reference's 1e-4 score_thr).
    2048 is the measured perf sweet spot (the round-2 6144 default cost the
    streaming bench 33%); exactness-critical callers (parity tests) pass a
    window covering every candidate."""
    scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    decoded = box_ops.delta2bbox(
        rois, bbox_pred.astype(jnp.float32), stds=stds, max_shape=img_shape
    )
    if scale_factor is not None:
        k = decoded.shape[-1] // 4
        decoded = decoded / jnp.tile(jnp.asarray(scale_factor), (k,))
    return nms_ops.multiclass_nms(
        decoded, scores, score_thr, iou_threshold, max_per_img,
        box_valid=roi_valid, pre_top_k=nms_pre,
    )
