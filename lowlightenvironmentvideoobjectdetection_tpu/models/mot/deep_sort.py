"""DeepSORT and Tracktor MOT models.

Parity targets:
- DeepSORT: mmtracking/mmtrack/models/mot/deep_sort.py:10-127 — detector
  (or public bboxes) -> ReID crops -> SortTracker association -> track
  results. Training raises NotImplementedError in the reference (L51); here
  the detector/reid are trained via their own losses.
- Tracktor: mmtrack/models/mot/tracktor.py:11-148 — adds RoI-head
  re-regression of the previous frame's boxes ("regress_tracks",
  tracktor_tracker.py:57-78) before association.

Architecture: detector + reid forwards are jitted fixed-shape device steps;
the tracker loop is host-side numpy (models/mot/trackers.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import boxes as box_ops
from ..detectors.faster_rcnn import FasterRCNN, faster_rcnn_detect
from ..reid.base_reid import BaseReID
from ..roi_heads import bbox_head as bh
from .trackers import SortTracker, TracktorTracker

REID_CROP_HW = (256, 128)


def crop_and_resize(img: jnp.ndarray, boxes: jnp.ndarray, out_hw=REID_CROP_HW):
    """Fixed-count differentiable crops for the ReID net.

    img: [H, W, 3]; boxes: [N, 4]. Bilinear resize of each box region via
    jax.image.scale_and_translate per box (static shapes).
    """
    h, w, _ = img.shape
    oh, ow = out_hw

    def one(b):
        x1, y1, x2, y2 = b[0], b[1], b[2], b[3]
        bw = jnp.maximum(x2 - x1, 1.0)
        bh_ = jnp.maximum(y2 - y1, 1.0)
        scale = jnp.asarray([oh / bh_, ow / bw])
        translation = jnp.asarray([-y1 * oh / bh_, -x1 * ow / bw])
        return jax.image.scale_and_translate(
            img, (oh, ow, 3), (0, 1), scale, translation, "linear"
        )

    return jax.vmap(one)(boxes)


class DeepSORT:
    """Host orchestrator: compiled det/reid steps + SortTracker."""

    def __init__(self, detector: FasterRCNN, det_params, anchors,
                 reid: Optional[BaseReID] = None, reid_params=None,
                 tracker: Optional[SortTracker] = None,
                 max_reid_dets: int = 48):
        self.detector = detector
        self.det_params = det_params
        self.anchors = anchors
        self.reid = reid
        self.reid_params = reid_params
        self.tracker = tracker or SortTracker()
        # ReID crop budget: multiclass_nms emits detections score-DESCENDING,
        # so the first max_reid_dets rows are the top-scored ones; the
        # R50-ReID on 100 fixed 256x128 crops was ~2x the detector's own
        # FLOPs while MOT frames rarely carry >40 above-threshold dets.
        # Everything past the cap is dropped from association (it would be
        # discarded by the tracker's obj_score_thr in all but pathological
        # frames).
        self.max_reid_dets = max_reid_dets

        # weights as jit args, not closures (remote-compile size limits)
        _det = jax.jit(
            lambda p, a, img, shape: faster_rcnn_detect(detector, p, img, shape, a)
        )
        self._det_step = lambda img, shape: _det(self.det_params, anchors, img, shape)
        if reid is not None:
            _reid = jax.jit(
                lambda p, img, boxes: reid.apply(p, crop_and_resize(img, boxes))
            )
            self._reid_step = lambda img, boxes: _reid(self.reid_params, img, boxes)
            # fused detect + ReID-on-every-det: ONE device round trip per
            # frame. The private-detection path otherwise pays 1 (detect) +
            # ceil(N/32) (reid) host syncs per frame — on a remote-TPU
            # tunnel each sync is ~30 ms of RTT, 5x the compute itself.
            kcap = max_reid_dets

            def _fused(det_p, reid_p, a, img, shape):
                dets = faster_rcnn_detect(detector, det_p, img, shape, a)
                # score-descending output -> top-kcap crops only
                top = jax.tree.map(lambda t: t[:kcap], dets)
                embeds = reid.apply(reid_p, crop_and_resize(img, top.boxes))
                return top, embeds

            _fused = jax.jit(_fused)
            self._det_reid_step = lambda img, shape: _fused(
                self.det_params, self.reid_params, anchors, img, shape)

    def reset(self):
        self.tracker.reset()

    def dispatch_detect(self, img: jnp.ndarray, img_shape):
        """Asynchronously enqueue detect(+ReID) for one frame.

        JAX dispatch is async: this returns immediately with device arrays
        that materialize when the device finishes. The tracker association
        for a frame only depends on that frame's detections, so frame t+1's
        detect can run on-device (and its dispatch/readback RTTs can be in
        flight) while the host associates frame t — see ``track_video``.
        """
        shape = jnp.asarray(img_shape, jnp.float32)
        if self.reid is not None:
            out = self._det_reid_step(img, shape)
        else:
            out = self._det_step(img, shape)
        # start the D2H transfer as soon as compute finishes (instead of at
        # the blocking device_get): on a remote-TPU tunnel the transfer's
        # round trip then overlaps the host-side association of the PREVIOUS
        # frame rather than serializing after it
        for leaf in jax.tree_util.tree_leaves(out):
            leaf.copy_to_host_async()
        return out

    def _fetch_detections(self, pending):
        """Block on a ``dispatch_detect`` handle -> host (boxes, scores,
        labels, embeds). ONE batched device_get for the whole frame result:
        per-array np.asarray readbacks each pay a full round trip on
        remote-TPU tunnels (~30 ms apiece, 5 of them dominated the frame
        time)."""
        got = jax.device_get(pending)
        embeds = None
        if self.reid is not None:
            dets, all_embeds = got
            embeds = all_embeds[dets.valid]
        else:
            dets = got
        valid = dets.valid
        return dets.boxes[valid], dets.scores[valid], dets.labels[valid], embeds

    def track_frame(self, frame_id: int, img: jnp.ndarray, img_shape,
                    public_bboxes: Optional[np.ndarray] = None,
                    prefetched=None):
        """One frame -> dict(det_bboxes [N,5], track_bboxes [M,6]).

        ``prefetched``: a ``dispatch_detect`` handle for THIS frame issued
        earlier (pipelining); skips the synchronous dispatch."""
        if frame_id == 0:
            self.tracker.reset()
        embeds = None
        if public_bboxes is None:
            boxes, scores, labels, embeds = self._fetch_detections(
                prefetched if prefetched is not None
                else self.dispatch_detect(img, img_shape))
        else:
            boxes = public_bboxes[:, :4]
            scores = public_bboxes[:, 4]
            labels = np.zeros(len(boxes), np.int64)

        if self.reid is not None and embeds is None and len(boxes):
            # public-detection path: fixed 32-crop ReID batches (static
            # shape), chunked so EVERY det gets an embedding (the reference
            # embeds all crops, sort_tracker.py reid path)
            chunks = []
            for s in range(0, len(boxes), 32):
                part = boxes[s:s + 32]
                pad = np.zeros((32 - len(part), 4), np.float32)
                padded = jnp.asarray(np.concatenate([part, pad]))
                chunks.append(np.asarray(self._reid_step(img, padded))
                              [: len(part)])
            embeds = np.concatenate(chunks, axis=0)

        ids, keep = self.tracker.track(frame_id, boxes, scores, labels, embeds)
        m = ids >= 0
        track_bboxes = np.concatenate(
            [ids[m, None].astype(np.float32), boxes[m], scores[m, None]], axis=1
        )
        det_bboxes = np.concatenate([boxes, scores[:, None]], axis=1)
        return dict(det_bboxes=det_bboxes, det_labels=labels,
                    track_bboxes=track_bboxes, track_labels=labels[m])

    def track_video(self, imgs, img_shape):
        """Pipelined streaming over a frame sequence (private-det path).

        Pipelined with DEPTH frames in flight: frame t+1's detect+ReID is
        dispatched BEFORE blocking on frame t's readback, so the device
        computes (and the tunnel round-trips fly) while the host runs
        Kalman/LAP association on frame t. Identical results to calling ``track_frame`` per frame
        — the tracker state only ever consumes fetched detections in frame
        order. ``imgs`` may be a list/array of frames or any iterable."""
        from collections import deque

        DEPTH = 3  # frames in flight: covers dispatch + readback RTTs
        it = iter(imgs)
        pending: deque = deque()
        results = []
        fid = 0
        exhausted = False
        while True:
            while not exhausted and len(pending) < DEPTH:
                try:
                    nxt = next(it)
                except StopIteration:
                    exhausted = True
                    break
                pending.append(self.dispatch_detect(jnp.asarray(nxt),
                                                    img_shape))
            if not pending:
                break
            results.append(self.track_frame(fid, None, img_shape,
                                            prefetched=pending.popleft()))
            fid += 1
        return results


class Tracktor:
    """Tracktor orchestrator: adds compiled track-box re-regression.

    ``with_cmc`` / ``with_linear_motion`` mirror the reference's switches
    (mmtrack/models/mot/tracktor.py:60-70): before re-regression, previous
    track boxes are warped by the ECC camera-motion estimate between the
    last and current RAW frames, and/or extrapolated by the per-track
    linear velocity."""

    def __init__(self, detector: FasterRCNN, det_params, anchors,
                 tracker: Optional[TracktorTracker] = None,
                 max_tracks: int = 64,
                 with_cmc: bool = False,
                 with_linear_motion: bool = False,
                 linear_motion_num_samples: int = 2):
        self.detector = detector
        self.det_params = det_params
        self.anchors = anchors
        self.tracker = tracker or TracktorTracker()
        self.max_tracks = max_tracks
        self.with_cmc = with_cmc
        self.with_linear_motion = with_linear_motion
        if with_cmc:
            from ...core.motion.cmc import CameraMotionCompensation

            self.cmc = CameraMotionCompensation()
        if with_linear_motion:
            from ...core.motion.linear import LinearMotion

            self.linear_motion = LinearMotion(
                num_samples=linear_motion_num_samples)
        self._last_raw_img: Optional[np.ndarray] = None
        self._history: dict = {}

        _det = jax.jit(
            lambda p, a, img, shape: faster_rcnn_detect(detector, p, img, shape, a)
        )
        self._det_step = lambda img, shape: _det(self.det_params, anchors, img, shape)

        def regress(det_params, img, shape, boxes):
            _, neck = detector.apply(
                det_params, img[None], method=FasterRCNN.extract_feat
            )
            rf = detector.apply(
                det_params, neck[0], boxes,
                jnp.zeros((boxes.shape[0],), jnp.int32),
                method=FasterRCNN.roi_feats,
            )
            cls_score, bbox_pred = detector.apply(
                det_params, rf, method=FasterRCNN.bbox_forward
            )
            scores = jax.nn.softmax(cls_score, axis=-1)
            nc = detector.cfg.num_classes
            best = jnp.argmax(scores[:, :nc], axis=-1)
            fg_score = jnp.take_along_axis(scores[:, :nc], best[:, None], 1)[:, 0]
            pred = bbox_pred.reshape(-1, nc, 4)
            pred = jnp.take_along_axis(pred, best[:, None, None], 1)[:, 0]
            new_boxes = box_ops.delta2bbox(
                boxes, pred, stds=bh.BBOX_STDS, max_shape=None
            )
            return new_boxes, fg_score

        _regress = jax.jit(regress)
        self._regress_step = lambda img, shape, boxes: _regress(
            self.det_params, img, shape, boxes
        )

    def reset(self):
        self.tracker.reset()
        self._last_raw_img = None
        self._history = {}

    def track_frame(self, frame_id: int, img: jnp.ndarray, img_shape,
                    public_bboxes: Optional[np.ndarray] = None,
                    raw_img: Optional[np.ndarray] = None):
        if frame_id == 0:
            self.reset()

        regressed_boxes = regressed_scores = None
        active = self.tracker.ids
        if active:
            prev = np.stack([self.tracker.tracks[t].bbox for t in active])
            # camera motion compensation (tracktor.py:60-64): warp previous
            # boxes into the current frame's coordinates
            if self.with_cmc and raw_img is not None \
                    and self._last_raw_img is not None:
                warp = self.cmc.get_warp_matrix(raw_img, self._last_raw_img)
                prev = self.cmc.warp_bboxes(prev, warp)
            # linear motion (tracktor.py:65-70): velocity extrapolation from
            # each track's recent boxes
            if self.with_linear_motion:
                for k, t in enumerate(active):
                    hist = self._history.get(t)
                    if hist and len(hist) >= 2:
                        prev[k] = self.linear_motion.step(
                            hist[-self.linear_motion.num_samples:] + [prev[k]]
                        )
            pad = np.zeros((self.max_tracks - len(prev), 4), np.float32)
            padded = jnp.asarray(np.concatenate([prev, pad])[: self.max_tracks])
            nb, ns = self._regress_step(img, jnp.asarray(img_shape), padded)
            regressed_boxes = np.asarray(nb)[: len(prev)]
            regressed_scores = np.asarray(ns)[: len(prev)]

        if public_bboxes is None:
            dets = self._det_step(img, jnp.asarray(img_shape, jnp.float32))
            valid = np.asarray(dets.valid)
            boxes = np.asarray(dets.boxes)[valid]
            scores = np.asarray(dets.scores)[valid]
            labels = np.asarray(dets.labels)[valid]
        else:
            boxes = public_bboxes[:, :4]
            scores = public_bboxes[:, 4]
            labels = np.zeros(len(boxes), np.int64)

        ids, tb, ts, tl = self.tracker.track(
            frame_id, boxes, scores, labels, regressed_boxes, regressed_scores
        )
        # per-track box history for linear motion; raw frame for CMC
        for i, t in enumerate(ids):
            self._history.setdefault(int(t), []).append(tb[i].copy())
            if len(self._history[int(t)]) > 8:
                self._history[int(t)] = self._history[int(t)][-8:]
        if raw_img is not None:
            self._last_raw_img = raw_img
        track_bboxes = np.concatenate(
            [ids[:, None].astype(np.float32), tb, ts[:, None]], axis=1
        ) if len(ids) else np.zeros((0, 6))
        return dict(
            det_bboxes=np.concatenate([boxes, scores[:, None]], axis=1),
            det_labels=labels, track_bboxes=track_bboxes, track_labels=tl,
        )
