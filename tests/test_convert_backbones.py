"""Converter golden parity for the PointNet and DGCNN backbone families.

Torch replicas follow the reference architectures (pointnet.py:10-150,
dgcnn_orig.py:22-152) with identical attribute names, so their state dicts
exercise the converter exactly like the released pointnet/dgcnn checkpoints.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_cloud_reid_tpu.convert import convert_reidnet_state_dict  # noqa: E402
from point_cloud_reid_tpu.models.dgcnn import DGCNNBackbone  # noqa: E402
from point_cloud_reid_tpu.models.pointnet import PointNetBackbone  # noqa: E402


class TorchSTN(tnn.Module):
    """STN3d/STNkd replica (pointnet.py:10-85), channel-first."""

    def __init__(self, k):
        super().__init__()
        self.k = k
        self.conv1 = tnn.Conv1d(k, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, k * k)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)
        self.bn4 = tnn.BatchNorm1d(512)
        self.bn5 = tnn.BatchNorm1d(256)

    def forward(self, x):                      # (B, k, N)
        B = x.size(0)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = torch.max(x, 2)[0]
        x = F.relu(self.bn4(self.fc1(x)))
        x = F.relu(self.bn5(self.fc2(x)))
        x = self.fc3(x)
        iden = torch.eye(self.k).flatten().repeat(B, 1)
        return (x + iden).view(-1, self.k, self.k)


class TorchPointNetEncoder(tnn.Module):
    """PointNetEncoder replica (pointnet.py:88-127)."""

    def __init__(self, channel=3):
        super().__init__()
        self.stn = TorchSTN(3)
        self.conv1 = tnn.Conv1d(channel, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.bn1 = tnn.BatchNorm1d(64)
        self.bn2 = tnn.BatchNorm1d(128)
        self.bn3 = tnn.BatchNorm1d(1024)
        self.fstn = TorchSTN(64)

    def forward(self, xyz):                    # (B, N, 3)
        x = xyz.transpose(2, 1)                # (B, 3, N)
        trans = self.stn(x)
        x = torch.bmm(xyz, trans).transpose(2, 1)
        x = F.relu(self.bn1(self.conv1(x)))
        ftrans = self.fstn(x)
        x = torch.bmm(x.transpose(2, 1), ftrans).transpose(2, 1)
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return xyz, x.transpose(2, 1)          # feats channel-last


class TorchPointNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.feat = TorchPointNetEncoder(channel=3)

    def forward(self, x):
        return self.feat(x)


def test_pointnet_conversion_parity():
    torch.manual_seed(0)
    tmod = tnn.Module()
    tmod.backbone = TorchPointNet()
    tmod.eval()

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, pts, train=False):
            return PointNetBackbone(channel=3, name="backbone")(
                pts, train=train)

    fmod = Wrap()
    pts = np.random.RandomState(0).randn(2, 24, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                          train=False)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables, report = convert_reidnet_state_dict(sd, variables, strict=True)

    with torch.no_grad():
        _, ref = tmod.backbone(torch.from_numpy(pts))
    _, got = fmod.apply(variables, jnp.asarray(pts), train=False)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


class TorchDGCNN(tnn.Module):
    """DGCNN replica (dgcnn_orig.py:89-152) with its feature-space kNN
    edge features (get_graph_feature, :31-54)."""

    def __init__(self, emb_dims=64, k=6):
        super().__init__()
        self.k = k
        self.bn1 = tnn.BatchNorm2d(64)
        self.bn2 = tnn.BatchNorm2d(64)
        self.bn3 = tnn.BatchNorm2d(128)
        self.bn4 = tnn.BatchNorm2d(256)
        self.bn5 = tnn.BatchNorm1d(emb_dims)
        self.conv1 = tnn.Sequential(tnn.Conv2d(6, 64, 1, bias=False),
                                    self.bn1, tnn.LeakyReLU(0.2))
        self.conv2 = tnn.Sequential(tnn.Conv2d(128, 64, 1, bias=False),
                                    self.bn2, tnn.LeakyReLU(0.2))
        self.conv3 = tnn.Sequential(tnn.Conv2d(128, 128, 1, bias=False),
                                    self.bn3, tnn.LeakyReLU(0.2))
        self.conv4 = tnn.Sequential(tnn.Conv2d(256, 256, 1, bias=False),
                                    self.bn4, tnn.LeakyReLU(0.2))
        self.conv5 = tnn.Sequential(tnn.Conv1d(512, emb_dims, 1, bias=False),
                                    self.bn5, tnn.LeakyReLU(0.2))

    @staticmethod
    def _graph_feature(x, k):                  # x: (B, C, N)
        B, C, N = x.shape
        inner = -2 * torch.matmul(x.transpose(2, 1), x)
        xx = torch.sum(x ** 2, dim=1, keepdim=True)
        d = -xx - inner - xx.transpose(2, 1)
        idx = d.topk(k=k, dim=-1)[1]           # (B, N, k)
        base = torch.arange(B).view(-1, 1, 1) * N
        idx = (idx + base).view(-1)
        xt = x.transpose(2, 1).contiguous().view(B * N, C)
        feat = xt[idx].view(B, N, k, C)
        center = xt.view(B, N, 1, C).repeat(1, 1, k, 1)
        out = torch.cat((feat - center, center), dim=3)
        return out.permute(0, 3, 1, 2)          # (B, 2C, N, k)

    def forward(self, xyz):                    # (B, N, 3) channel-last in
        x = xyz.transpose(2, 1)
        x1 = self.conv1(self._graph_feature(x, self.k)).max(dim=-1)[0]
        x2 = self.conv2(self._graph_feature(x1, self.k)).max(dim=-1)[0]
        x3 = self.conv3(self._graph_feature(x2, self.k)).max(dim=-1)[0]
        x4 = self.conv4(self._graph_feature(x3, self.k)).max(dim=-1)[0]
        x = torch.cat((x1, x2, x3, x4), dim=1)
        return xyz, self.conv5(x).transpose(2, 1)


def test_dgcnn_conversion_parity():
    torch.manual_seed(1)
    tmod = tnn.Module()
    tmod.backbone = TorchDGCNN(emb_dims=64, k=6)
    tmod.eval()

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, pts, train=False):
            return DGCNNBackbone(emb_dims=64, k=6, name="backbone")(
                pts, train=train)

    fmod = Wrap()
    pts = np.random.RandomState(1).randn(2, 20, 3).astype(np.float32)
    variables = fmod.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                          train=False)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    variables, report = convert_reidnet_state_dict(sd, variables, strict=True)

    with torch.no_grad():
        _, ref = tmod.backbone(torch.from_numpy(pts))
    _, got = fmod.apply(variables, jnp.asarray(pts), train=False)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)
