"""Public inference APIs.

Parity targets: mmtracking/mmtrack/apis/inference.py:12-209 (``init_model``,
``inference_vid``) and mmdetection/mmdet/apis/inference.py:16-120
(``init_detector``, ``inference_detector``). Same call shapes: build from a
config (here a registered model name + kwargs), then feed raw frames and get
per-class [N, 5] arrays back — the reference's result format.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import zoo  # noqa: F401 — populates the MODELS registry
from ..data.preprocess import prepare_frames
from ..registry import MODELS


def result_to_per_class(dets, num_classes: int) -> List[np.ndarray]:
    """Fixed-shape DetResult -> the reference's list of per-class [N, 5]."""
    valid = np.asarray(dets.valid)
    boxes = np.asarray(dets.boxes)[valid]
    scores = np.asarray(dets.scores)[valid]
    labels = np.asarray(dets.labels)[valid]
    out = []
    for c in range(num_classes):
        m = labels == c
        out.append(
            np.concatenate([boxes[m], scores[m, None]], axis=1).astype(np.float32)
        )
    return out


class VIDModel:
    """A built video detector + its compiled streaming step (init_model).

    ``ref_method``: 'adaptive' keeps the frame-0 reference memo for the whole
    video (test_with_adaptive_stride, coco_video_dataset.py:198-203); 'fix'
    rolls the memo with each streamed frame's own features
    (test_with_fix_stride, :204-218).
    """

    def __init__(self, model_type: str = "SELSA", params=None, rng_seed: int = 0,
                 ref_method: str = "adaptive", frame_stride: int = 1,
                 **model_kwargs):
        from ..models.vid import selsa as S

        self.model, self.anchors = MODELS.build(
            dict(type=model_type, **model_kwargs)
        )
        self.cfg = self.model.cfg
        if params is None:
            params = S.init_params(self.model, jax.random.PRNGKey(rng_seed),
                                   small=True)
        # bf16-store the weights for inference on TPU (halves the per-frame
        # weight stream, numerically identical to flax's per-use cast); CPU
        # keeps f32 — bf16 matmuls are slower there and the compute_dtype may
        # be f32 (parity configs)
        if (jax.default_backend() == "tpu"
                and self.cfg.compute_dtype == jnp.bfloat16):
            params = S.cast_params_for_inference(params)
        self.params = params
        self._S = S
        self.state = None
        assert ref_method in ("adaptive", "fix"), ref_method
        self.ref_method = ref_method
        # fix-stride mode rolls the memo every `frame_stride` frames
        # (coco_video_dataset.py:204-218 sets frame_stride meta; selsa.py:256)
        self.frame_stride = max(int(frame_stride), 1)

        # params/anchors are jit arguments (closures would bake the weights
        # into the HLO as constants — fatal on remote-compile TPU tunnels)
        update = ref_method == "fix"

        # Per-family step/init dispatch: FGFA and DFF carry their own memo
        # shapes and step fns (models/vid/fgfa.py); everything else streams
        # through the SELSA step (the darkfarm family's test path IS the
        # noisy-branch SELSA stream, selsa_darkfarm_detect.py:215+).
        kind = type(self.model).__name__
        if kind == "FGFA":
            from ..models.vid import fgfa as FG

            def step(params, anchors, state, frame, img_shape, sf, do_update):
                return FG.fgfa_inference_step(
                    self.model, params, state, frame, img_shape, sf, anchors)

            def init_state(params, refs, img_shape, anchors):
                return FG.fgfa_init_state(self.model, params, refs)

        elif kind == "DFF":
            from ..models.vid import fgfa as FG

            def step(params, anchors, state, frame, img_shape, sf, do_update):
                return FG.dff_inference_step(
                    self.model, params, state, frame, img_shape, sf, anchors)

            def init_state(params, refs, img_shape, anchors):
                # frame 0 is always a key frame (frames_since_key=0), so the
                # zero placeholders are replaced before first use
                c = self.cfg
                return FG.DFFState(
                    jnp.zeros((c.pad_h, c.pad_w, refs.shape[-1]),
                              jnp.float32),
                    jnp.zeros((c.pad_h // c.stride, c.pad_w // c.stride,
                               c.neck_channels), c.compute_dtype),
                    jnp.zeros((), jnp.int32),
                )

        else:
            def step(params, anchors, state, frame, img_shape, sf, do_update):
                return S.inference_step(
                    self.model, params, state, frame, img_shape, sf, anchors,
                    update_memo=update, do_update=do_update,
                )

            def init_state(params, refs, img_shape, anchors):
                return S.init_video_state(self.model, params, refs,
                                          img_shape, anchors)

        self._init_state_fn = init_state

        # the carried VideoState is donated: it is replaced by the returned
        # state every step, and without aliasing XLA copies the ~35 MB
        # pass-through K/V memo into fresh buffers every frame
        self._step_fn = jax.jit(step, donate_argnums=(2,))
        self._step = lambda state, frame, img_shape, sf, do=True: self._step_fn(
            self.params, self.anchors, state, frame, img_shape, sf,
            jnp.asarray(do),
        )

    def _maybe_pack(self, imgs):
        """Host-side space-to-depth pack ([..., h, w, c] -> [..., h/2**L,
        w/2**L, 4**L c]) when the model uses the packed-input contract
        (input_packed level L): the pack rides the host pipeline next to
        normalize/pad instead of costing ~370 us/frame of on-device layout
        work."""
        lvl = int(getattr(self.cfg, "input_packed", 0))
        if lvl:
            from ..models.backbones.resnet import pack_frame

            imgs = np.asarray(imgs)
            for _ in range(lvl):
                imgs = pack_frame(imgs)
        return imgs

    def inference_vid(self, frame: np.ndarray, frame_id: int,
                      ref_frames: Optional[np.ndarray] = None) -> Dict:
        """Streaming API (apis/inference.py:136-209): feed frames in order;
        at frame 0 supply the sampled reference frames (or the first frame is
        replicated, as the reference does for fix-stride)."""
        cfg = self.cfg
        imgs, img_shape, sf = prepare_frames(
            frame[None], cfg.pad_h, cfg.pad_w
        )
        if frame_id == 0:
            if ref_frames is None:
                refs = np.repeat(frame[None], cfg.num_ref_frames, axis=0)
            else:
                refs = ref_frames
            ref_imgs, _, _ = prepare_frames(refs, cfg.pad_h, cfg.pad_w)
            self.state = self._init_state_fn(
                self.params, self._maybe_pack(ref_imgs), img_shape,
                self.anchors
            )
        do = (self.ref_method != "fix"
              or frame_id % self.frame_stride == 0)
        self.state, dets = self._step(
            self.state, self._maybe_pack(imgs[0]), img_shape,
            jnp.asarray(sf), do
        )
        return dict(bbox_results=result_to_per_class(dets, cfg.num_classes))

    def _pad_prepared(self, img: np.ndarray) -> np.ndarray:
        """Pad an already resized+normalized pipeline image to the static
        bucket, keeping only the model's input channels (the noisy half of a
        6/8-ch pair — the reference streams the noisy branch at test time,
        selsa_darkfarm_detect.py:215+)."""
        cfg = self.cfg
        c = img.shape[-1] if img.ndim == 3 else 1
        # the noisy half of a 2C-channel pair: RAW models (RGGB stem,
        # backbone_in_channels=4) keep 4 channels, sRGB models 3
        keep = min(c, getattr(cfg, "backbone_in_channels", 3))
        canvas = np.zeros((cfg.pad_h, cfg.pad_w, keep), np.float32)
        h = min(img.shape[0], cfg.pad_h)
        w = min(img.shape[1], cfg.pad_w)
        canvas[:h, :w] = img[:h, :w, :keep]
        return canvas

    def inference_vid_prepared(
        self,
        img: np.ndarray,
        img_shape=None,
        scale_factor=None,
        frame_id: int = 0,
        ref_imgs: Optional[np.ndarray] = None,
    ) -> Dict:
        """Streaming API over PIPELINE-PREPARED images: the test pipeline has
        already resized/brightened/normalized (Resize/Brighten/Normalize),
        so only the static-bucket pad happens here. ``scale_factor`` (from
        the pipeline's Resize) maps detections back to original coordinates
        (rescale=True). ``ref_imgs``: [S, h, w, C] prepared reference frames
        at frame 0 (test_with_adaptive_stride output)."""
        cfg = self.cfg
        canvas = self._pad_prepared(img)
        if img_shape is None:
            img_shape = img.shape[:2]
        shape = jnp.asarray([float(img_shape[0]), float(img_shape[1])])
        if scale_factor is None:
            scale_factor = np.ones((4,), np.float32)
        sf = jnp.asarray(np.asarray(scale_factor, np.float32))
        if frame_id == 0:
            if ref_imgs is None:
                refs = np.repeat(canvas[None], cfg.num_ref_frames, axis=0)
            else:
                refs = np.stack([self._pad_prepared(r) for r in ref_imgs])
            self.state = self._init_state_fn(
                self.params, jnp.asarray(self._maybe_pack(refs)), shape,
                self.anchors
            )
        do = (self.ref_method != "fix"
              or frame_id % self.frame_stride == 0)
        self.state, dets = self._step(
            self.state, jnp.asarray(self._maybe_pack(canvas)), shape, sf, do)
        return dict(bbox_results=result_to_per_class(dets, cfg.num_classes))


def init_model(model_type: str = "SELSA", checkpoint=None, **kwargs) -> VIDModel:
    m = VIDModel(model_type=model_type, **kwargs)
    if checkpoint is not None:
        from ..utils.checkpoint import load_checkpoint

        params = load_checkpoint(checkpoint)  # unwraps TrainState trees
        # a darkfarm-family checkpoint nests the detector under 'selsa'
        # (+ 'cleaner'/'aggregator' siblings); slice it out when this model
        # is the plain streaming SELSA detector
        if isinstance(params, dict):
            own_has = any(isinstance(t, dict) and "selsa" in t
                          for t in m.params.values())
            ckpt_has = any(isinstance(t, dict) and "selsa" in t
                           for t in params.values())
            if ckpt_has and not own_has:
                params = {coll: tree["selsa"] for coll, tree in params.items()
                          if isinstance(tree, dict) and "selsa" in tree}
        m.params = params
    return m


def inference_vid(model: VIDModel, frame: np.ndarray, frame_id: int,
                  ref_frames: Optional[np.ndarray] = None) -> Dict:
    return model.inference_vid(frame, frame_id, ref_frames)


class DetectorModel:
    """Single-image detector wrapper (init_detector/inference_detector).

    Dispatches loss-free inference through apis.families — EVERY registered
    image-detector type runs its own decode path, matching the reference's
    ``inference_detector`` working for any built detector
    (mmdet/apis/inference.py:89)."""

    def __init__(self, model_type: str = "FasterRCNN", params=None,
                 rng_seed: int = 0, tiny: bool = False, pad_hw=None,
                 **model_kwargs):
        from .families import get_family, init_variables

        from .families import FAMILIES

        fam = get_family(model_type)
        if fam is None:
            raise KeyError(f"{model_type!r} has no inference adapter "
                           f"(known: {sorted(FAMILIES)})")
        self.family = fam
        self.model, self.aux = fam.build(dict(model_kwargs), tiny)
        self.cfg = getattr(self.model, "cfg", None)
        self.num_classes = (self.cfg.num_classes if self.cfg is not None
                            else self.model.num_classes)
        if params is None:
            params = init_variables(self.model, fam, seed=rng_seed)
        self.params = params
        if pad_hw is not None:
            self.pad_h, self.pad_w = pad_hw
        elif self.cfg is not None:
            self.pad_h, self.pad_w = self.cfg.pad_h, self.cfg.pad_w
        elif fam.input_hw == (300, 300):  # fixed-input nets (SSD)
            self.pad_h, self.pad_w = 300, 300
        elif tiny:
            self.pad_h, self.pad_w = fam.input_hw or (128, 128)
        else:
            self.pad_h, self.pad_w = 768, 1280  # stride-128-divisible bucket

        # anchors-as-argument (closures bake weights into remote-compiled
        # HLO); non-array aux (anchor generators) stays a trace-time const
        if isinstance(self.aux, (jnp.ndarray, np.ndarray)):
            self._detect_fn = jax.jit(
                lambda params, aux, img, shape, sf: fam.detect(
                    self.model, aux, params, img, shape, sf))
            self._detect = lambda img, shape, sf: self._detect_fn(
                self.params, self.aux, img, shape, sf)
        else:
            self._detect_fn = jax.jit(
                lambda params, img, shape, sf: fam.detect(
                    self.model, self.aux, params, img, shape, sf))
            self._detect = lambda img, shape, sf: self._detect_fn(
                self.params, img, shape, sf)

    def inference_detector(self, img: np.ndarray) -> List[np.ndarray]:
        imgs, img_shape, sf = prepare_frames(
            img[None], self.pad_h, self.pad_w
        )
        dets = self._detect(imgs[0], img_shape, jnp.asarray(sf))
        return result_to_per_class(dets, self.num_classes)

    def detect_prepared(self, img: np.ndarray, img_shape=None,
                        scale_factor=None) -> List[np.ndarray]:
        """Pipeline-prepared image (already resized/normalized): pad to the
        static bucket, detect, rescale via the pipeline's scale_factor."""
        canvas = np.zeros((self.pad_h, self.pad_w, 3), np.float32)
        h = min(img.shape[0], self.pad_h)
        w = min(img.shape[1], self.pad_w)
        canvas[:h, :w] = img[:h, :w, :3]
        if img_shape is None:
            img_shape = img.shape[:2]
        shape = jnp.asarray([float(img_shape[0]), float(img_shape[1])])
        if scale_factor is None:
            scale_factor = np.ones((4,), np.float32)
        dets = self._detect(jnp.asarray(canvas), shape,
                            jnp.asarray(np.asarray(scale_factor, np.float32)))
        return result_to_per_class(dets, self.num_classes)


def init_detector(model_type: str = "FasterRCNN", **kwargs) -> DetectorModel:
    return DetectorModel(model_type=model_type, **kwargs)


def inference_detector(model: DetectorModel, img: np.ndarray):
    return model.inference_detector(img)


def inference_mot(model, img: np.ndarray, frame_id: int) -> Dict:
    """MOT streaming API (apis/inference.py:52-95): model is a built DeepSORT
    or Tracktor orchestrator."""
    imgs, img_shape, sf = prepare_frames(
        img[None], model.detector.cfg.pad_h, model.detector.cfg.pad_w
    )
    return model.track_frame(frame_id, imgs[0], np.asarray(img_shape),
                             raw_img=img) \
        if type(model).__name__ == "Tracktor" else \
        model.track_frame(frame_id, imgs[0], np.asarray(img_shape))


class SOTModel:
    """A built SiamRPN++ tracker + its compiled per-frame step.

    Mirrors mmtrack's ``init_model`` + ``inference_sot``
    (mmtrack/apis/inference.py:96-135): ``inference_sot(model, img,
    init_bbox, frame_id)`` initializes the template at frame 0 and tracks
    afterwards, returning ``dict(track_bboxes=[x1, y1, x2, y2, score])``."""

    def __init__(self, params=None, rng_seed: int = 0, **model_kwargs):
        import jax

        from ..models.sot import siamrpn as S

        self._S = S
        self.cfg = S.SiamRPNConfig(**model_kwargs)
        self.model = S.SiamRPN(cfg=self.cfg)
        if params is None:
            z = jnp.zeros((1, self.cfg.exemplar_size, self.cfg.exemplar_size, 3))
            x = jnp.zeros((1, self.cfg.search_size, self.cfg.search_size, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(rng_seed), z, x)
        self.params = params
        # score-map size via one traced head pass
        z = jnp.zeros((1, self.cfg.exemplar_size, self.cfg.exemplar_size, 3))
        x = jnp.zeros((1, self.cfg.search_size, self.cfg.search_size, 3))
        cls, _ = jax.eval_shape(lambda p: self.model.apply(p, z, x), self.params)
        score_size = cls.shape[0]
        self.anchors = jnp.asarray(S.sot_grid_anchors(self.cfg, score_size))
        self.window = jnp.asarray(
            S.hanning_window(score_size, self.cfg.num_anchors))
        self.state = None

        self._track = jax.jit(
            lambda params, state, img, anchors, window: S.sot_track(
                self.model, params, state, img, anchors, window))

    def inference_sot(self, img: np.ndarray, init_bbox, frame_id: int) -> Dict:
        img = jnp.asarray(np.asarray(img, np.float32))
        if frame_id == 0:
            self.state = self._S.sot_init(self.model, self.params, img,
                                          init_bbox)
            b = np.asarray(init_bbox, np.float32)
            return dict(track_bboxes=np.concatenate([b, [1.0]]))
        self.state, score, xyxy = self._track(
            self.params, self.state, img, self.anchors, self.window)
        return dict(track_bboxes=np.concatenate(
            [np.asarray(xyxy, np.float32), [float(score)]]))


def init_sot_model(checkpoint=None, **kwargs) -> SOTModel:
    m = SOTModel(**kwargs)
    if checkpoint is not None:
        from ..utils.checkpoint import load_checkpoint

        m.params = load_checkpoint(checkpoint)
    return m


def inference_sot(model: SOTModel, img: np.ndarray, init_bbox,
                  frame_id: int) -> Dict:
    """Public SOT API (reference apis/inference.py:96)."""
    return model.inference_sot(img, init_bbox, frame_id)
