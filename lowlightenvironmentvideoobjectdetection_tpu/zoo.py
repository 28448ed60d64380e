"""Model zoo: registry bindings from reference model-type names to this
framework's factories.

Covers the registered names in the reference (SURVEY.md Appendix A):
VID: DFF, FGFA, SELSA, SelsaDarkfarmDetect, SelsaNewDarkfarmDetect,
SelsaNoiseDetect, SelsaNoiseDarkfarmDetect, SelsaCleanDetect,
SelsaCleanDarkfarmDetect, LLVOD (+ the aggregator variants as flags);
DET: FasterRCNN; MOT: DeepSORT, Tracktor. Each factory returns a
``(model, anchors)``-style system the apis layer drives.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .models.vid.selsa import SelsaConfig
from .registry import MODELS


def _selsa_cfg(num_classes=30, pad_h=608, pad_w=1024, out_indices=(3,), **kw):
    cd = kw.get("compute_dtype")
    if isinstance(cd, str):  # config files name dtypes as strings
        kw["compute_dtype"] = dict(
            float32=jnp.float32, bfloat16=jnp.bfloat16, float16=jnp.float16
        )[cd]
    bo = kw.get("backbone_overrides")
    if isinstance(bo, dict):  # configs write a dict; the dataclass wants a
        kw["backbone_overrides"] = tuple(  # hashable tuple-of-pairs
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in sorted(bo.items())
        )
    return SelsaConfig(
        num_classes=num_classes, pad_h=pad_h, pad_w=pad_w,
        out_indices=tuple(out_indices), **kw,
    )


@MODELS.register("FasterRCNN")
def build_faster_rcnn(num_classes: int = 30, **kw):
    from .models.detectors.faster_rcnn import make_faster_rcnn

    return make_faster_rcnn(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("SELSA")
def build_selsa(num_classes: int = 30, **kw):
    from .models.vid.selsa import make_selsa

    return make_selsa(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("FGFA")
def build_fgfa(num_classes: int = 30, **kw):
    from .models.vid.fgfa import make_fgfa

    return make_fgfa(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("DFF")
def build_dff(num_classes: int = 30, key_frame_interval: int = 10, **kw):
    from .models.vid.fgfa import make_dff

    return make_dff(_selsa_cfg(num_classes=num_classes, **kw), key_frame_interval)


def _darkfarm(num_classes, loss_type, with_cleaner, out_indices, in_channels=3,
              with_aggregator=False, agg_rdb=True, agg_taf=True,
              dual_branch="both", **kw):
    from .models.vid.selsa_darkfarm import DarkfarmConfig, make_darkfarm

    # the paired-input 5-stage darkfarm models are the HBM-tight ones:
    # keep the backbone remat on unless the config says otherwise
    kw.setdefault("remat", True)
    cfg = DarkfarmConfig(
        selsa=_selsa_cfg(num_classes=num_classes, out_indices=out_indices, **kw),
        loss_type=loss_type, with_cleaner=with_cleaner, in_channels=in_channels,
        with_aggregator=with_aggregator, agg_rdb=agg_rdb, agg_taf=agg_taf,
        dual_branch=dual_branch,
    )
    return make_darkfarm(cfg)


@MODELS.register("SelsaDarkfarmDetect")
def build_selsa_darkfarm(num_classes: int = 8, loss_type: str = "l1",
                         out_indices=(0, 1, 2, 3, 3), **kw):
    return _darkfarm(num_classes, loss_type, True, out_indices, **kw)


@MODELS.register("SelsaNewDarkfarmDetect")
def build_selsa_new_darkfarm(num_classes: int = 8, loss_type: str = "l1",
                             out_indices=(0, 1, 2, 3, 3), **kw):
    """SelsaDarkfarmDetect + Denoising2Aggregator between backbone and heads,
    dual `_u`/`_d` feature losses (selsa_new_darkfarm_detect.py)."""
    return _darkfarm(num_classes, loss_type, True, out_indices,
                     with_aggregator=True, **kw)


@MODELS.register("SelsaNewDetect")
def build_selsa_new_det(num_classes: int = 30, loss_type: str = "l1",
                        out_indices=(0, 1, 2, 3, 3), **kw):
    """Aggregator-augmented SELSA for ImageNet-VID synthetic noise
    (selsa_new_det.py) — same system, VID class count, no disk pairs."""
    return _darkfarm(num_classes, loss_type, True, out_indices,
                     with_aggregator=True, **kw)


@MODELS.register("SelsaNewVIDDetect")
def build_selsa_new_vid(num_classes: int = 30, loss_type: str = "l1",
                        out_indices=(0, 1, 2, 3, 3), **kw):
    """(selsa_new_vid_detect.py) — alias family of SelsaNewDetect."""
    return _darkfarm(num_classes, loss_type, True, out_indices,
                     with_aggregator=True, **kw)


@MODELS.register("DarkDetect")
def build_dark_detect(num_classes: int = 30, out_indices=(0, 1, 2, 3, 3), **kw):
    """Early design: detector + aggregator + cleaner with per-stage MSE
    (dark_detect.py:114-121) — config degeneration with loss_type='l2'."""
    return _darkfarm(num_classes, "l2", True, out_indices,
                     with_aggregator=True, **kw)


@MODELS.register("SelsaDarkDetect")
def build_selsa_dark_detect(num_classes: int = 30, out_indices=(0, 1, 2, 3, 3),
                            **kw):
    """Earlier dark variant on the ConvLSTM DarkResNet backbone
    (slesa_dark_detect.py [sic]); configs may override backbone_variant
    (e.g. the selsa_tra ResNetH ablations)."""
    kw.setdefault("backbone_variant", "DarkResNet")
    loss_type = kw.pop("loss_type", "l2")
    return _darkfarm(num_classes, loss_type, True, out_indices, **kw)


@MODELS.register("SelsaNoiseDetect")
def build_selsa_noise(num_classes: int = 30, loss_type: str = "l1",
                      out_indices=(3, 3), **kw):
    return _darkfarm(num_classes, loss_type, False, out_indices, **kw)


@MODELS.register("SelsaNoiseDarkfarmDetect")
def build_selsa_noise_darkfarm(num_classes: int = 8, loss_type: str = "l1",
                               out_indices=(3, 3), **kw):
    return _darkfarm(num_classes, loss_type, False, out_indices, **kw)


@MODELS.register("SelsaCleanDetect")
def build_selsa_clean(num_classes: int = 30, loss_type: str = "l1",
                      out_indices=(3, 3), **kw):
    """Oracle baseline on the clean half; drive its training with
    darkfarm_loss(branch='clean') — tools/train.py CLEAN_TYPES does."""
    return _darkfarm(num_classes, loss_type, False, out_indices, **kw)


@MODELS.register("SelsaCleanDarkfarmDetect")
def build_selsa_clean_darkfarm(num_classes: int = 8, loss_type: str = "l1",
                               out_indices=(3, 3), **kw):
    """See build_selsa_clean."""
    return _darkfarm(num_classes, loss_type, False, out_indices, **kw)


@MODELS.register("LLVOD")
def build_llvod(num_classes: int = 8, loss_type: str = "l2",
                out_indices=(0, 1, 2, 3, 3), **kw):
    return _darkfarm(num_classes, loss_type, True, out_indices, **kw)


@MODELS.register("DeepSORT")
def build_deepsort(det_params=None, reid_params=None, num_classes: int = 1,
                   with_reid: bool = True, **kw):
    import jax

    from .models.detectors.faster_rcnn import make_faster_rcnn
    from .models.mot.deep_sort import DeepSORT
    from .models.reid.base_reid import BaseReID

    detector, anchors = make_faster_rcnn(_selsa_cfg(num_classes=num_classes, **kw))
    if det_params is None:
        det_params = jax.jit(detector.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
    reid = reid_params_built = None
    if with_reid:
        reid = BaseReID()
        reid_params_built = reid_params or jax.jit(reid.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 256, 128, 3))
        )
    return DeepSORT(detector, det_params, anchors, reid, reid_params_built)


@MODELS.register("Tracktor")
def build_tracktor(det_params=None, num_classes: int = 1,
                   with_cmc: bool = False, with_linear_motion: bool = False,
                   linear_motion_num_samples: int = 2, **kw):
    import jax

    from .models.detectors.faster_rcnn import make_faster_rcnn
    from .models.mot.deep_sort import Tracktor

    detector, anchors = make_faster_rcnn(_selsa_cfg(num_classes=num_classes, **kw))
    if det_params is None:
        det_params = jax.jit(detector.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
    return Tracktor(detector, det_params, anchors, with_cmc=with_cmc,
                    with_linear_motion=with_linear_motion,
                    linear_motion_num_samples=linear_motion_num_samples)


@MODELS.register("NASFPNRetinaNet")
def build_nasfpn_retinanet(num_classes: int = 80, depth: int = 50, **kw):
    """NAS-FPN RetinaNet (reference: mmdetection/configs/nas_fpn/ — NASFPN
    neck + RetinaSepBNHead with per-level norm, shared conv kernels)."""
    from .models.dense_heads.retina_head import (
        NASFPNRetinaNet, retina_anchor_generator,
    )

    return NASFPNRetinaNet(num_classes=num_classes, depth=depth, **kw), \
        retina_anchor_generator()


@MODELS.register("RetinaNet")
def build_retinanet(num_classes: int = 80, depth: int = 50, **kw):
    """Single-stage RetinaNet (reference: mmdet/models/detectors/retinanet.py
    + retina_head.py:9). Returns (model, anchor_generator)."""
    from .models.dense_heads.retina_head import RetinaNet, retina_anchor_generator

    return RetinaNet(num_classes=num_classes, depth=depth, **kw), \
        retina_anchor_generator()


@MODELS.register("YOLOV3")
def build_yolov3(num_classes: int = 80, **kw):
    """YOLOv3 Darknet-53 (reference: mmdet yolo.py / yolo_head.py:20)."""
    from .models.detectors.yolov3 import YOLOV3

    return YOLOV3(num_classes=num_classes, **kw)


@MODELS.register("SiamRPN")
def build_siamrpn(**kw):
    """SiameseRPN++ single-object tracker (reference: mmtrack sot/siamrpn.py)."""
    from .models.sot.siamrpn import SiamRPNConfig, make_siamrpn

    return make_siamrpn(SiamRPNConfig(**kw))


@MODELS.register("SelsaFastDVDnetDetect")
def build_selsa_fastdvd(num_classes: int = 8, denoiser: str = "fastdvd",
                        **kw):
    """Two-stage baseline: FastDVDnet (or Unet, reference
    llvod_unet_darkfarm.py) image-space denoiser, then SELSA detection on
    the denoised frames (reference: selsa_fastdvd_darkfarm.py)."""
    from .models.vid.selsa_fastdvd import FastDVDSelsaConfig, make_fastdvd_selsa

    return make_fastdvd_selsa(
        FastDVDSelsaConfig(selsa=_selsa_cfg(num_classes=num_classes, **kw),
                           denoiser=denoiser)
    )


def _register_pipelines():
    """Import the pipeline modules so their PIPELINES registrations run."""
    from .data import pipelines  # noqa: F401


def _register_datasets():
    from .data.datasets import (
        CocoVideoDataset, DarkFarmVIDDataset, ImagenetVIDDataset,
    )
    from .data.mot_sot_datasets import (
        LaSOTDataset, MOTChallengeDataset, SOTTrainDataset,
    )
    from .registry import DATASETS

    from .data.coco_det import CocoDataset
    from .data.voc import VOCDataset, XMLDataset

    from .data.extra_datasets import (
        CityscapesDataset, DeepFashionDataset, LVISV1Dataset, LVISV05Dataset,
        WIDERFaceDataset,
    )

    DATASETS.register("CocoDataset")(CocoDataset)
    DATASETS.register("XMLDataset")(XMLDataset)
    DATASETS.register("VOCDataset")(VOCDataset)
    DATASETS.register("CityscapesDataset")(CityscapesDataset)
    DATASETS.register("DeepFashionDataset")(DeepFashionDataset)
    DATASETS.register("WIDERFaceDataset")(WIDERFaceDataset)
    DATASETS.register("LVISDataset")(LVISV05Dataset)
    DATASETS.register("LVISV05Dataset")(LVISV05Dataset)
    DATASETS.register("LVISV1Dataset")(LVISV1Dataset)
    DATASETS.register("CocoVideoDataset")(CocoVideoDataset)
    DATASETS.register("ImagenetVIDDataset")(ImagenetVIDDataset)
    DATASETS.register("DarkFarmVIDDataset")(DarkFarmVIDDataset)
    DATASETS.register("MOTChallengeDataset")(MOTChallengeDataset)
    DATASETS.register("LaSOTDataset")(LaSOTDataset)
    DATASETS.register("SOTTrainDataset")(SOTTrainDataset)


def _register_components():
    """Bind component classes into their registries for config-driven builds
    (reference registry names: SURVEY.md Appendix A)."""
    from .registry import AGGREGATORS, BACKBONES, CLEANERS, MOTION, NECKS

    from .models.aggregators.selsa_aggregator import SelsaAggregator
    from .models.motion.flownet_simple import EmbedAggregator
    from .models.aggregators.denoising_aggregator import (
        DenoisingAggregator, Denoising2Aggregator,
    )
    from .models.backbones.resnet import ResNet
    from .models.cleaners.resclean import ResCleaner
    from .models.cleaners.video_denoisers import FastDVDnet, Unet
    from .models.necks.channel_mapper import ChannelMapper
    from .models.necks.fpn import FPN
    from .models.motion.flownet_simple import FlowNetSimple
    from .core.motion.kalman import KalmanFilter
    from .core.motion.linear import LinearMotion
    from .core.motion.cmc import CameraMotionCompensation

    from .models.backbones.dark_resnet import DARK_VARIANTS, make_dark_backbone

    for _name in DARK_VARIANTS:
        BACKBONES.register(_name)(
            (lambda n: lambda **kw: make_dark_backbone(n, **kw))(_name)
        )

    AGGREGATORS.register("SelsaAggregator")(SelsaAggregator)
    AGGREGATORS.register("EmbedAggregator")(EmbedAggregator)
    AGGREGATORS.register("DenoisingAggregator")(DenoisingAggregator)
    AGGREGATORS.register("Denoising2Aggregator")(Denoising2Aggregator)
    # keep the reference's (typo'd) registry key working too
    AGGREGATORS.register("Denoising2Aggergator")(Denoising2Aggregator)
    BACKBONES.register("ResNet")(ResNet)
    CLEANERS.register("ResCleaner")(ResCleaner)
    CLEANERS.register("FastDVDnet")(FastDVDnet)
    CLEANERS.register("Unet")(Unet)
    NECKS.register("ChannelMapper")(ChannelMapper)
    NECKS.register("FPN")(FPN)
    MOTION.register("FlowNetSimple")(FlowNetSimple)
    MOTION.register("KalmanFilter")(KalmanFilter)
    MOTION.register("LinearMotion")(LinearMotion)
    MOTION.register("CameraMotionCompensation")(CameraMotionCompensation)


_register_components()
_register_pipelines()
_register_datasets()


@MODELS.register("FCOS")
def build_fcos(num_classes: int = 80, depth: int = 50, **kw):
    """Anchor-free FCOS (reference: mmdet fcos.py + fcos_head.py:15)."""
    from .models.dense_heads.fcos_head import FCOS

    return FCOS(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("SSD")
def build_ssd(num_classes: int = 80, **kw):
    """SSD-300 VGG16 (reference: mmdet ssd_vgg.py + ssd_head.py:16)."""
    from .models.detectors.ssd import SSD

    return SSD(num_classes=num_classes, **kw)


@MODELS.register("CascadeRCNN")
def build_cascade(num_classes: int = 80, **kw):
    """Cascade R-CNN, 3 refinement stages (reference: mmdet cascade_rcnn.py)."""
    from .models.detectors.cascade_rcnn import make_cascade_rcnn

    return make_cascade_rcnn(_selsa_cfg(num_classes=num_classes, **kw))


def _register_heads_trackers_reid():
    """Remaining Appendix-A registries: HEADS, TRACKERS, REID."""
    from .registry import HEADS, REID, TRACKERS

    from .models.dense_heads.fcos_head import FCOSHead
    from .models.dense_heads.retina_head import RetinaHead
    from .models.dense_heads.rpn_head import RPNHead
    from .models.detectors.ssd import SSDHead
    from .models.detectors.yolov3 import YOLOV3Head
    from .models.mot.trackers import BaseTracker, SortTracker, TracktorTracker
    from .models.reid.base_reid import BaseReID, LinearReIDHead
    from .models.roi_heads.bbox_head import Shared2FCBBoxHead
    from .models.roi_heads.temporal_roi_align import TemporalRoIAlign
    from .models.sot.siamrpn import CorrelationHead

    HEADS.register("RPNHead")(RPNHead)
    HEADS.register("RetinaHead")(RetinaHead)
    HEADS.register("FCOSHead")(FCOSHead)
    HEADS.register("SSDHead")(SSDHead)
    HEADS.register("YOLOV3Head")(YOLOV3Head)
    HEADS.register("Shared2FCBBoxHead")(Shared2FCBBoxHead)
    # SelsaBBoxHead = Shared2FCBBoxHead(with_selsa=True) — keep the name
    HEADS.register("SelsaBBoxHead")(
        lambda **kw: Shared2FCBBoxHead(with_selsa=True, **kw))
    HEADS.register("SiameseRPNHead")(CorrelationHead)
    HEADS.register("TemporalRoIAlign")(TemporalRoIAlign)
    TRACKERS.register("BaseTracker")(BaseTracker)
    TRACKERS.register("SortTracker")(SortTracker)
    TRACKERS.register("TracktorTracker")(TracktorTracker)
    REID.register("BaseReID")(BaseReID)
    REID.register("LinearReIDHead")(LinearReIDHead)


_register_heads_trackers_reid()


@MODELS.register("ATSS")
def build_atss(num_classes: int = 80, depth: int = 50, **kw):
    """ATSS adaptive-sample-selection detector (reference: mmdet atss.py +
    atss_head.py)."""
    from .models.dense_heads.atss_head import ATSS

    return ATSS(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("MaskRCNN")
def build_mask_rcnn(num_classes: int = 80, **kw):
    """Mask R-CNN (reference: mmdet mask_rcnn.py + fcn_mask_head.py)."""
    from .models.detectors.mask_rcnn import make_mask_rcnn

    return make_mask_rcnn(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("DETR")
def build_detr(num_classes: int = 80, **kw):
    """DETR set-prediction detector (reference: mmdet detr.py +
    transformer_head.py); Hungarian matching runs the native C++ JV solver."""
    from .models.detectors.detr import DETR

    return DETR(num_classes=num_classes, **kw)


@MODELS.register("GFL")
def build_gfl(num_classes: int = 80, depth: int = 50, **kw):
    """Generalized Focal Loss detector (reference: mmdet gfl.py +
    gfl_head.py): quality focal + distribution focal + GIoU, ATSS assign."""
    from .models.dense_heads.gfl_head import GFL

    return GFL(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("FSAF")
def build_fsaf(num_classes: int = 80, depth: int = 50, **kw):
    """FSAF anchor-free online-level-selection detector (reference: mmdet
    fsaf.py + fsaf_head.py:15)."""
    from .models.dense_heads.fsaf_head import FSAF

    return FSAF(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("FoveaBox")
@MODELS.register("FOVEA")
def build_fovea(num_classes: int = 80, depth: int = 50, **kw):
    """FoveaBox per-level fovea-region detector (reference: mmdet fovea.py +
    fovea_head.py:43)."""
    from .models.dense_heads.fovea_head import FoveaBox

    return FoveaBox(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("FreeAnchor")
@MODELS.register("FreeAnchorRetinaNet")
def build_free_anchor(num_classes: int = 80, depth: int = 50, **kw):
    """FreeAnchor learning-to-match RetinaNet (reference: mmdet
    free_anchor_retina_head.py:40); same tower as RetinaNet, the loss is
    free_anchor_head.free_anchor_loss."""
    from .models.dense_heads.retina_head import RetinaNet

    return RetinaNet(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("PAA")
def build_paa(num_classes: int = 80, depth: int = 50, **kw):
    """Probabilistic anchor assignment detector (reference: mmdet paa.py +
    paa_head.py:45)."""
    from .models.dense_heads.paa_head import PAA

    return PAA(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("VFNet")
def build_vfnet(num_classes: int = 80, depth: int = 50, **kw):
    """VarifocalNet with star-DCN refinement (reference: mmdet vfnet.py +
    vfnet_head.py:64)."""
    from .models.dense_heads.vfnet_head import VFNet

    return VFNet(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("RepPointsDetector")
@MODELS.register("RepPoints")
def build_reppoints(num_classes: int = 80, depth: int = 50, **kw):
    """RepPoints point-set detector (reference: mmdet
    reppoints_detector.py + reppoints_head.py)."""
    from .models.dense_heads.reppoints_head import RepPointsDetector

    return RepPointsDetector(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("SABL")
@MODELS.register("SABLRetinaNet")
def build_sabl(num_classes: int = 80, depth: int = 50, **kw):
    """Side-aware boundary localization retina detector (reference: mmdet
    sabl_retina_head.py + bucketing_bbox_coder.py)."""
    from .models.dense_heads.sabl_head import SABLRetinaNet

    return SABLRetinaNet(num_classes=num_classes, depth=depth, **kw)


def _register_extra_backbones_necks():
    """Round-2 zoo breadth: extra backbones (resnext/res2net/regnet/hrnet/
    hourglass) and necks (pafpn/hrfpn/bfp/nasfpn/fpg/carafe-fpn)."""
    from .registry import BACKBONES, NECKS

    from .models.backbones.resnet import ResNeXt
    from .models.backbones.res2net import Res2Net
    from .models.backbones.regnet import RegNet
    from .models.backbones.hrnet import HRNet
    from .models.backbones.hourglass import HourglassNet
    from .models.necks.extra_necks import (
        BFP, FPG, FPNCarafe, HRFPN, NASFPN, PAFPN,
    )

    BACKBONES.register("ResNeXt")(ResNeXt)
    BACKBONES.register("Res2Net")(Res2Net)
    BACKBONES.register("RegNet")(RegNet)
    BACKBONES.register("HRNet")(HRNet)
    BACKBONES.register("HourglassNet")(HourglassNet)
    NECKS.register("PAFPN")(PAFPN)
    NECKS.register("HRFPN")(HRFPN)
    NECKS.register("BFP")(BFP)
    NECKS.register("NASFPN")(NASFPN)
    NECKS.register("FPG")(FPG)
    NECKS.register("FPN_CARAFE")(FPNCarafe)


_register_extra_backbones_necks()


@MODELS.register("SparseRCNN")
def build_sparse_rcnn(num_classes: int = 80, num_proposals: int = 100, **kw):
    """Sparse R-CNN learnable-proposal detector (reference: mmdet
    sparse_rcnn.py + embedding_rpn_head.py + dii_head)."""
    from .models.detectors.sparse_rcnn import SparseRCNN

    return SparseRCNN(num_classes=num_classes, num_proposals=num_proposals,
                      **kw)


@MODELS.register("NASFCOS")
def build_nasfcos(num_classes: int = 80, depth: int = 50, **kw):
    """NAS-FCOS (reference: mmdet nasfcos.py + nasfcos_head.py:75)."""
    from .models.dense_heads.pisa_nasfcos import NASFCOS

    return NASFCOS(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("PISARetinaNet")
@MODELS.register("PISA")
def build_pisa_retina(num_classes: int = 80, depth: int = 50, **kw):
    """PISA ISR-P/CARL RetinaNet (reference: mmdet pisa_retinanet_head.py);
    train with pisa_nasfcos.pisa_retina_loss."""
    from .models.dense_heads.retina_head import RetinaNet

    return RetinaNet(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("YOLACT")
def build_yolact(num_classes: int = 80, depth: int = 50, **kw):
    """YOLACT prototype-mask instance segmentation (reference: mmdet
    yolact.py + yolact_head.py)."""
    from .models.dense_heads.yolact_head import YOLACT

    return YOLACT(num_classes=num_classes, depth=depth, **kw)


@MODELS.register("CornerNet")
def build_cornernet(num_classes: int = 80, **kw):
    """CornerNet keypoint detector with corner pooling (reference: mmdet
    cornernet.py + corner_head.py:1 + mmcv CornerPool)."""
    from .models.dense_heads.corner_head import CornerNet

    return CornerNet(num_classes=num_classes, **kw)


@MODELS.register("CentripetalNet")
def build_centripetalnet(num_classes: int = 80, **kw):
    """CentripetalNet: corners matched by centripetal shifts (reference:
    mmdet centripetalnet.py + centripetal_head.py)."""
    from .models.dense_heads.corner_head import CentripetalNet

    return CentripetalNet(num_classes=num_classes, **kw)


def _register_backbones_round2b():
    from .registry import BACKBONES, NECKS

    from .models.backbones.resnest import ResNeSt
    from .models.backbones.detectors_trident import (
        DetectoRSResNet, RFP, TridentResNet,
    )

    BACKBONES.register("ResNeSt")(ResNeSt)
    BACKBONES.register("DetectoRS_ResNet")(DetectoRSResNet)
    BACKBONES.register("TridentResNet")(TridentResNet)
    NECKS.register("RFP")(RFP)


_register_backbones_round2b()


@MODELS.register("FastRCNN")
def build_fast_rcnn(num_classes: int = 80, **kw):
    """Fast R-CNN over precomputed proposals (reference: mmdet
    fast_rcnn.py)."""
    from .models.detectors.more_rcnn import FastRCNN

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    from .models.vid.selsa import make_anchors

    return FastRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("RPN")
def build_rpn(num_classes: int = 1, **kw):
    """Standalone region proposal network (reference: mmdet rpn.py)."""
    from .models.detectors.more_rcnn import RPN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return RPN(cfg=cfg), make_anchors(cfg)


@MODELS.register("MaskScoringRCNN")
def build_mask_scoring_rcnn(num_classes: int = 80, **kw):
    """Mask Scoring R-CNN (reference: mask_scoring_rcnn.py +
    maskiou_head.py)."""
    from .models.detectors.more_rcnn import MaskScoringRCNN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return MaskScoringRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("PointRend")
def build_point_rend(num_classes: int = 80, **kw):
    """PointRend mask refinement (reference: point_rend.py +
    point_rend_roi_head.py)."""
    from .models.detectors.more_rcnn import PointRendRCNN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return PointRendRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("GridRCNN")
def build_grid_rcnn(num_classes: int = 80, **kw):
    """Grid R-CNN border-heatmap localization (reference: grid_rcnn.py +
    grid_head.py)."""
    from .models.detectors.more_rcnn import GridRCNN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return GridRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("TridentFasterRCNN")
def build_trident_faster_rcnn(num_classes: int = 80, **kw):
    """Trident Faster R-CNN (reference: trident_faster_rcnn.py)."""
    from .models.detectors.more_rcnn import TridentFasterRCNN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return TridentFasterRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("HybridTaskCascade")
@MODELS.register("HTC")
def build_htc(num_classes: int = 80, **kw):
    """Hybrid Task Cascade (reference: htc.py + htc_roi_head.py)."""
    from .models.detectors.htc import make_htc

    return make_htc(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("SCNet")
def build_scnet(num_classes: int = 80, **kw):
    """SCNet (reference: scnet.py — HTC + feature relay/global context)."""
    from .models.detectors.htc import make_htc

    return make_htc(_selsa_cfg(num_classes=num_classes, **kw), scnet=True)


@MODELS.register("GuidedAnchoring")
@MODELS.register("GARetinaNet")
def build_ga_retinanet(num_classes: int = 80, **kw):
    """Guided-anchoring RetinaNet (reference: guided_anchor_head.py:4
    GARetinaHead — anchor shape/loc prediction + DeformConv feature
    adaption), as a full backbone+FPN+head detector."""
    from .models.dense_heads.guided_anchor_head import GARetinaNet

    return GARetinaNet(num_classes=num_classes, **kw)


@MODELS.register("GARetinaHead")
def build_ga_retina_head(num_classes: int = 80, **kw):
    """The bare guided-anchoring head (feats-in), kept for head-level use."""
    from .models.dense_heads.guided_anchor_head import GARetinaHead

    return GARetinaHead(num_classes=num_classes, **kw)


@MODELS.register("CascadeRPN")
def build_cascade_rpn(num_classes: int = 1, **kw):
    """Cascade RPN (reference: cascade_rpn_head.py + configs/cascade_rpn/
    crpn_r50_caffe_fpn_1x_coco.py — stage-wise anchor refinement with
    adaptive convs over the shared DC5 trunk)."""
    from .models.dense_heads.cascade_rpn_head import CascadeRPNModel

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return CascadeRPNModel(cfg=cfg)


def _register_losses():
    """LOSSES registry with the reference's type names
    (mmdet/models/losses/__init__.py) bound to the pure-JAX loss fns."""
    from .core import losses as L
    from .registry import LOSSES

    LOSSES.register("CrossEntropyLoss")(L.softmax_cross_entropy)
    LOSSES.register("BinaryCrossEntropyLoss")(L.binary_cross_entropy)
    LOSSES.register("FocalLoss")(L.sigmoid_focal_loss)
    LOSSES.register("SmoothL1Loss")(L.smooth_l1_loss)
    LOSSES.register("L1Loss")(L.l1_loss)
    LOSSES.register("MSELoss")(L.mse_loss)
    LOSSES.register("L2Loss")(L.l2_loss_hard_mining)
    LOSSES.register("IoULoss")(L.iou_loss)
    LOSSES.register("GIoULoss")(L.giou_loss)
    LOSSES.register("DIoULoss")(L.diou_loss)
    LOSSES.register("CIoULoss")(L.ciou_loss)
    LOSSES.register("BoundedIoULoss")(L.bounded_iou_loss)
    LOSSES.register("BalancedL1Loss")(L.balanced_l1_loss)
    LOSSES.register("GHMC")(L.ghm_c_loss)
    LOSSES.register("GHMR")(L.ghm_r_loss)
    LOSSES.register("GaussianFocalLoss")(L.gaussian_focal_loss)
    LOSSES.register("AssociativeEmbeddingLoss")(L.ae_loss)


@MODELS.register("DoubleHeadRoIHead")
@MODELS.register("DoubleHeadRCNN")
def build_double_head_rcnn(num_classes: int = 80, **kw):
    """Double-Head R-CNN (reference: double_roi_head.py +
    double_bbox_head.py; configs/double_heads/)."""
    from .models.detectors.roi_head_families import DoubleHeadRCNN
    from .models.vid.selsa import make_anchors

    cfg = _selsa_cfg(num_classes=num_classes, **kw)
    return DoubleHeadRCNN(cfg=cfg), make_anchors(cfg)


@MODELS.register("DynamicRCNN")
def build_dynamic_rcnn(num_classes: int = 80, **kw):
    """Dynamic R-CNN (reference: dynamic_roi_head.py; configs/dynamic_rcnn/)
    — the trunk is a plain Faster R-CNN; the dynamic IoU/beta schedule lives
    in the training loop (roi_head_families.DynamicSchedule)."""
    from .models.detectors.faster_rcnn import make_faster_rcnn

    return make_faster_rcnn(_selsa_cfg(num_classes=num_classes, **kw))


@MODELS.register("PISARoIHead")
@MODELS.register("PISAFasterRCNN")
def build_pisa_faster_rcnn(num_classes: int = 80, **kw):
    """PISA two-stage (reference: pisa_roi_head.py + score_hlr_sampler.py;
    configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py). Same trunk as Faster
    R-CNN; the PISA machinery is the training loss."""
    from .models.detectors.faster_rcnn import make_faster_rcnn

    return make_faster_rcnn(_selsa_cfg(num_classes=num_classes, **kw))


def _build_fpn_frcnn(num_classes, kw, **variant):
    from .models.detectors.fpn_faster_rcnn import (
        FPNFasterRCNN, make_fpn_anchors)

    kw = dict(kw)
    if "compute_dtype" in kw:  # SelsaConfig-style knob -> dtype
        kw.setdefault("dtype", kw.pop("compute_dtype"))
    if isinstance(kw.get("dtype"), str):
        kw["dtype"] = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[
            kw["dtype"]]
    for k in ("train_nms_pre", "test_nms_pre"):
        kw.pop(k, None)
    model = FPNFasterRCNN(num_classes=num_classes, **variant, **kw)
    return model, make_fpn_anchors(model.pad_h, model.pad_w)


@MODELS.register("FasterRCNNFPN")
def build_faster_rcnn_fpn(num_classes: int = 80, **kw):
    """Multi-level FPN Faster R-CNN (reference:
    configs/_base_/models/faster_rcnn_r50_fpn.py — per-level RPN anchors +
    scale-dispatched RoIAlign)."""
    return _build_fpn_frcnn(num_classes, kw)


@MODELS.register("GARPNHead")
@MODELS.register("GAFasterRCNN")
def build_ga_faster_rcnn(num_classes: int = 80, **kw):
    """Guided-anchoring Faster R-CNN (reference: ga_rpn_head.py;
    configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py)."""
    return _build_fpn_frcnn(num_classes, kw, rpn_type="ga")


@MODELS.register("GenericRoIExtractor")
@MODELS.register("GRoIEFasterRCNN")
def build_groie_faster_rcnn(num_classes: int = 80, **kw):
    """GRoIE Faster R-CNN (reference: generic_roi_extractor.py;
    configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py)."""
    return _build_fpn_frcnn(num_classes, kw, roi_extract="groie")


@MODELS.register("LibraRCNN")
@MODELS.register("LibraFasterRCNN")
def build_libra_faster_rcnn(num_classes: int = 80, **kw):
    """Libra R-CNN (reference: configs/libra_rcnn/ — BFP non-local neck,
    IoU-balanced/instance-balanced sampling, BalancedL1 regression)."""
    return _build_fpn_frcnn(num_classes, kw, with_bfp=True)


_register_losses()
