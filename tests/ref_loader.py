"""Surgical loader for the reference's own mmdet modules (VERDICT r3 #2).

mmcv is not installed, so `/root/reference/mmdetection` can't be imported
as-is.  The risky target-assignment logic, however, is pure Python+torch:
the only external surface it touches is a handful of mmcv utilities
(`Registry`, `build_from_cfg`, `print_log`, `mmcv.jit`, `mmcv.is_str`) and
`terminaltables.AsciiTable`.  This module fakes exactly that surface, then
loads the REAL reference files under their true dotted names so their
relative imports resolve — goldens then assert repo == reference-code
output instead of repo == hand-transcription.

Loaded verbatim from /root/reference/mmdetection/mmdet:
  utils/util_mixins.py, core/anchor/utils.py, core/bbox/{builder,
  transforms}.py, core/bbox/iou_calculators/*.py, core/bbox/match_costs/*.py,
  core/bbox/assigners/*.py, core/bbox/coder/*.py,
  core/bbox/samplers/{base,sampling_result,random}_sampler.py,
  core/evaluation/{bbox_overlaps,class_names,mean_ap}.py

Nothing is copied into the repo; files execute from the read-only reference
tree. This is test-only scaffolding.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/mmdetection/mmdet"

_loaded = False


class _Registry:
    def __init__(self, name):
        self.name = name
        self.module_dict = {}

    def register_module(self, name=None, force=False, module=None):
        def _reg(cls):
            key = name if isinstance(name, str) else cls.__name__
            self.module_dict[key] = cls
            return cls

        if module is not None:
            return _reg(module)
        return _reg

    def get(self, key):
        return self.module_dict[key]


def _build_from_cfg(cfg, registry, default_args=None):
    args = dict(cfg)
    obj_type = args.pop("type")
    cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return cls(**args)


class _AsciiTable:
    def __init__(self, table_data, title=None):
        self.table_data = table_data
        self.title = title
        self.inner_footing_row_border = False

    @property
    def table(self):
        return "\n".join(" | ".join(str(c) for c in row) for row in self.table_data)


class SerialPool:
    """Drop-in for multiprocessing.Pool(n) — serial, fork-free (safe under jax)."""

    def __init__(self, n=None):
        pass

    def starmap(self, fn, iterable):
        return [fn(*args) for args in iterable]

    def map(self, fn, iterable):
        return [fn(a) for a in iterable]

    def close(self):
        pass

    def join(self):
        pass


def _fake_pkg(name):
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package
    sys.modules[name] = mod
    return mod


def _load_file(dotted, relpath):
    spec = importlib.util.spec_from_file_location(dotted, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    # attach to parent so `from pkg import submodule` works
    parent, _, leaf = dotted.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)
    return mod


def _install_fakes():
    mmcv = types.ModuleType("mmcv")
    mmcv.jit = lambda **kw: (lambda fn: fn)
    mmcv.is_str = lambda x: isinstance(x, str)
    mmcv.is_tuple_of = lambda seq, t: (isinstance(seq, tuple)
                                       and all(isinstance(x, t) for x in seq))
    utils = types.ModuleType("mmcv.utils")
    utils.Registry = _Registry
    utils.build_from_cfg = _build_from_cfg
    utils.print_log = lambda msg, logger=None, level=None: None
    mmcv.utils = utils
    mmcv.Registry = _Registry
    mmcv.build_from_cfg = _build_from_cfg
    ops = types.ModuleType("mmcv.ops")

    def _unavailable(*a, **k):  # score_hlr_sampler wants nms_match; not loaded
        raise NotImplementedError("mmcv.ops not faked")

    ops.nms_match = _unavailable
    mmcv.ops = ops
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = utils
    sys.modules["mmcv.ops"] = ops

    tt = types.ModuleType("terminaltables")
    tt.AsciiTable = _AsciiTable
    sys.modules["terminaltables"] = tt


def load():
    """Load the reference modules; returns the `mmdet` fake-package root."""
    global _loaded
    if _loaded:
        return sys.modules["mmdet"]
    if "mmdet" in sys.modules:
        raise RuntimeError("a real mmdet is present; refusing to shadow it")
    _install_fakes()

    mmdet = _fake_pkg("mmdet")
    _fake_pkg("mmdet.utils")
    core = _fake_pkg("mmdet.core")
    _fake_pkg("mmdet.core.anchor")
    bbox = _fake_pkg("mmdet.core.bbox")
    _fake_pkg("mmdet.core.bbox.iou_calculators")
    _fake_pkg("mmdet.core.bbox.match_costs")
    _fake_pkg("mmdet.core.bbox.assigners")
    _fake_pkg("mmdet.core.bbox.coder")
    _fake_pkg("mmdet.core.bbox.samplers")
    _fake_pkg("mmdet.core.evaluation")

    _load_file("mmdet.utils.util_mixins", "utils/util_mixins.py")
    _load_file("mmdet.utils.util_random", "utils/util_random.py")
    anchor_utils = _load_file("mmdet.core.anchor.utils", "core/anchor/utils.py")
    core.anchor_inside_flags = anchor_utils.anchor_inside_flags
    _load_file("mmdet.core.anchor.builder", "core/anchor/builder.py")
    anchor_gen = _load_file("mmdet.core.anchor.anchor_generator",
                            "core/anchor/anchor_generator.py")
    mmdet_anchor = sys.modules["mmdet.core.anchor"]
    for n in ("AnchorGenerator", "SSDAnchorGenerator",
              "LegacyAnchorGenerator", "YOLOAnchorGenerator"):
        if hasattr(anchor_gen, n):
            setattr(mmdet_anchor, n, getattr(anchor_gen, n))

    _load_file("mmdet.core.bbox.builder", "core/bbox/builder.py")
    transforms = _load_file("mmdet.core.bbox.transforms", "core/bbox/transforms.py")

    iou_builder = _load_file(
        "mmdet.core.bbox.iou_calculators.builder",
        "core/bbox/iou_calculators/builder.py",
    )
    iou2d = _load_file(
        "mmdet.core.bbox.iou_calculators.iou2d_calculator",
        "core/bbox/iou_calculators/iou2d_calculator.py",
    )
    iou_pkg = sys.modules["mmdet.core.bbox.iou_calculators"]
    iou_pkg.build_iou_calculator = iou_builder.build_iou_calculator
    iou_pkg.bbox_overlaps = iou2d.bbox_overlaps
    iou_pkg.BboxOverlaps2D = iou2d.BboxOverlaps2D

    mc_builder = _load_file(
        "mmdet.core.bbox.match_costs.builder", "core/bbox/match_costs/builder.py"
    )
    match_cost = _load_file(
        "mmdet.core.bbox.match_costs.match_cost", "core/bbox/match_costs/match_cost.py"
    )
    mc_pkg = sys.modules["mmdet.core.bbox.match_costs"]
    mc_pkg.build_match_cost = mc_builder.build_match_cost
    for n in ("BBoxL1Cost", "ClassificationCost", "FocalLossCost", "IoUCost"):
        setattr(mc_pkg, n, getattr(match_cost, n))

    a = "mmdet.core.bbox.assigners"
    _load_file(f"{a}.base_assigner", "core/bbox/assigners/base_assigner.py")
    _load_file(f"{a}.assign_result", "core/bbox/assigners/assign_result.py")
    for leaf in (
        "max_iou_assigner",
        "approx_max_iou_assigner",
        "atss_assigner",
        "center_region_assigner",
        "grid_assigner",
        "point_assigner",
        "region_assigner",
        "hungarian_assigner",
    ):
        _load_file(f"{a}.{leaf}", f"core/bbox/assigners/{leaf}.py")

    c = "mmdet.core.bbox.coder"
    _load_file(f"{c}.base_bbox_coder", "core/bbox/coder/base_bbox_coder.py")
    for leaf in (
        "delta_xywh_bbox_coder",
        "legacy_delta_xywh_bbox_coder",
        "tblr_bbox_coder",
        "yolo_bbox_coder",
        "bucketing_bbox_coder",
        "pseudo_bbox_coder",
    ):
        _load_file(f"{c}.{leaf}", f"core/bbox/coder/{leaf}.py")

    _load_file("mmdet.core.bbox.demodata", "core/bbox/demodata.py")
    s = "mmdet.core.bbox.samplers"
    _load_file(f"{s}.sampling_result", "core/bbox/samplers/sampling_result.py")
    _load_file(f"{s}.base_sampler", "core/bbox/samplers/base_sampler.py")
    _load_file(f"{s}.random_sampler", "core/bbox/samplers/random_sampler.py")

    e = "mmdet.core.evaluation"
    _load_file(f"{e}.bbox_overlaps", "core/evaluation/bbox_overlaps.py")
    _load_file(f"{e}.class_names", "core/evaluation/class_names.py")
    mean_ap = _load_file(f"{e}.mean_ap", "core/evaluation/mean_ap.py")
    # eval_map forks a Pool(nproc); swap in a serial fake — identical math,
    # no fork of a jax-initialized process.
    mean_ap.Pool = SerialPool

    # PISA losses (models/losses/pisa_loss.py) import
    # `from mmdet.core import bbox_overlaps` (the aligned-iou variant)
    core.bbox_overlaps = iou2d.bbox_overlaps
    _fake_pkg("mmdet.models")
    _fake_pkg("mmdet.models.losses")
    pisa_loss = _load_file("mmdet.models.losses.pisa_loss",
                           "models/losses/pisa_loss.py")

    # convenience handles
    mmdet.assigners = sys.modules[a]
    mmdet.coders = sys.modules[c]
    mmdet.samplers = sys.modules[s]
    mmdet.mean_ap = mean_ap
    mmdet.transforms = transforms
    mmdet.pisa_loss = pisa_loss
    _loaded = True
    return mmdet
