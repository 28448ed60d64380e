"""Numerical parity: our flax ResNet vs a PyTorch ResNet-50 with the SAME
(randomly initialized) weights imported through utils/torch_import — the
mechanism that makes reference/mmdet checkpoints loadable for mAP parity.

torchvision is not available in this image, so the test defines a minimal
torch ResNet-50 with torchvision-compatible state-dict key names
(conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1})."""

import numpy as np
import pytest

pytestmark = [pytest.mark.model, pytest.mark.slow]

torch = pytest.importorskip("torch")
nn = torch.nn

import jax
import jax.numpy as jnp

from lowlightenvironmentvideoobjectdetection_tpu.models.backbones.resnet import (
    ResNet,
)
from lowlightenvironmentvideoobjectdetection_tpu.utils.torch_import import (
    import_resnet,
)


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
        ):
            layers = []
            ds = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            layers.append(TorchBottleneck(inplanes, planes, stride, ds))
            inplanes = planes * 4
            for _ in range(blocks - 1):
                layers.append(TorchBottleneck(inplanes, planes))
            setattr(self, f"layer{li}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            outs.append(x)
        return outs


def _randomize_bn_stats(model, seed=0):
    """Non-trivial running stats so BN folding is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


class TestTorchParity:
    def test_resnet50_forward_parity(self):
        torch.manual_seed(0)
        tm = TorchResNet50()
        _randomize_bn_stats(tm)
        tm.eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        model = ResNet(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=-1,
                       dtype=jnp.float32)
        x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
        params, stats = import_resnet(sd)
        variables = {"params": params, "batch_stats": stats}

        outs = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            ref = [o.numpy().transpose(0, 2, 3, 1)
                   for o in tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

        for i, (ours, theirs) in enumerate(zip(outs, ref)):
            diff = np.abs(np.asarray(ours) - theirs).max()
            denom = max(np.abs(theirs).max(), 1e-6)
            assert diff / denom < 1e-3, f"stage {i}: rel diff {diff / denom}"

    def test_dc5_strides(self):
        """DC5 variant: stage-4 at stride 16 (dilation 2) — spatial shapes."""
        model = ResNet(depth=50, strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                       out_indices=(2, 3), frozen_stages=-1, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        c4, c5 = model.apply(v, x)
        assert c4.shape[1:3] == c5.shape[1:3] == (4, 4)  # both stride 16
