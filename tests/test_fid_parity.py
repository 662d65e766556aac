"""Numeric parity of the flax FID InceptionV3 + weight converter against a
torch implementation of pytorch-fid's FIDInceptionV3
(analysis/pytorch_fid/inception.py:16-345).

torchvision is not in this image, so the torch side is implemented here
with plain torch.nn, module names matching the pytorch-fid checkpoint's
state-dict layout exactly (Conv2d_1a_3x3..., Mixed_5b.branch1x1..., conv/bn
children) — so `load_torch_inception_weights` runs against the same key
names as the published pt_inception-2015-12-05 weights. The FID-specific
quirks are reproduced: avg-pool count_include_pad=False in InceptionA/C/E_1
and max-pool branch_pool in E_2 (inception.py "Patch" comments), BN
eps=1e-3, (2x-1) input normalization.

Random-init (with randomized BN stats) + activation comparison at 1e-4
catches any BN/padding/pooling/layout mismatch.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from mmvae_tpu.eval.fid import (
    InceptionV3FID, fid_preprocess, load_torch_inception_weights,
)


class TBasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        # FIDInceptionA: count_include_pad=False
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], 1)


class TInceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        # FIDInceptionC: count_include_pad=False
        bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        return torch.cat([self.branch1x1(x), b7, bd, self.branch_pool(bp)], 1)


class TInceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionE(nn.Module):
    def __init__(self, in_ch, pool: str):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":  # FIDInceptionE_1
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)
        else:  # FIDInceptionE_2: max-pool branch_pool ("Patch" in inception.py)
            bp = F.max_pool2d(x, 3, 1, 1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TorchFIDInceptionV3(nn.Module):
    """pytorch-fid FIDInceptionV3 up to pool3, checkpoint-compatible names."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, pool="avg")
        self.Mixed_7c = TInceptionE(2048, pool="max")

    def forward(self, x):
        x = 2 * x - 1  # normalize_input
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, 2)
        for blk in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                    self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                    self.Mixed_7a, self.Mixed_7b, self.Mixed_7c]:
            x = blk(x)
        return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)


def _randomize_bn(model, g):
    """Default BN stats (mean 0, var 1, w 1, b 0) would mask layout bugs."""
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            n = mod.num_features
            mod.running_mean = torch.rand(n, generator=g) * 0.2 - 0.1
            mod.running_var = torch.rand(n, generator=g) + 0.5
            with torch.no_grad():
                mod.weight.copy_(torch.rand(n, generator=g) + 0.5)
                mod.bias.copy_(torch.rand(n, generator=g) * 0.2 - 0.1)


@pytest.fixture(scope="module")
def parity_pair(tmp_path_factory):
    g = torch.Generator().manual_seed(0)
    tmodel = TorchFIDInceptionV3().eval()
    _randomize_bn(tmodel, g)
    pt_path = tmp_path_factory.mktemp("fid") / "inception_random.pt"
    torch.save(tmodel.state_dict(), str(pt_path))

    jmodel = InceptionV3FID()
    variables = jmodel.init(__import__("jax").random.PRNGKey(0),
                            jnp.zeros((1, 3, 96, 96)))
    variables = load_torch_inception_weights(variables, str(pt_path))
    return tmodel, jmodel, variables


def test_inception_activation_parity(parity_pair):
    """Converted weights: activations must agree layer-stack-deep to 1e-4.

    96x96 inputs (instead of 299) keep the CPU compile fast while still
    tracing every block, every pooling quirk, and every padding choice."""
    tmodel, jmodel, variables = parity_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
    assert ref.shape == got.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_fid_preprocess_matches_torch_interpolate():
    """fid_preprocess bilinear 299-resize vs torch F.interpolate
    (align_corners=False) + the zero-channel padding of add_channels
    (modalities/mnist_svhn.py:17, utils.py add_channels)."""
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 1, 28, 28)).astype(np.float32)
    got = np.asarray(fid_preprocess(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x), size=(299, 299), mode="bilinear",
                        align_corners=False).numpy()
    assert got.shape == (2, 3, 299, 299)
    np.testing.assert_allclose(got[:, :1], ref, rtol=1e-4, atol=1e-5)
    assert np.all(got[:, 1:] == 0)


def test_verify_fid_weights_hash(tmp_path):
    """--fid-weights flow: sha256 prefix parsed from the filename must
    match (torch.hub convention used by pytorch-fid's FID_WEIGHTS_URL,
    inception.py:13)."""
    import hashlib

    from mmvae_tpu.eval.fid import verify_fid_weights

    data = b"fake weights bytes"
    digest = hashlib.sha256(data).hexdigest()
    good = tmp_path / f"pt_inception-2015-12-05-{digest[:8]}.pth"
    good.write_bytes(data)
    assert verify_fid_weights(str(good)) == digest

    bad = tmp_path / "pt_inception-2015-12-05-deadbeef.pth"
    bad.write_bytes(data)
    with pytest.raises(ValueError, match="hash mismatch"):
        verify_fid_weights(str(bad))

    anon = tmp_path / "custom_encoder.pth"  # non-suffixed names pass
    anon.write_bytes(data)
    assert verify_fid_weights(str(anon)) == digest


def test_converter_flags_unconsumed_keys(parity_pair, tmp_path):
    """A checkpoint with unexpected tensor names must fail loudly; the
    published file's fc.* head and num_batches_tracked are tolerated."""
    tmodel, _, variables = parity_pair
    sd = tmodel.state_dict()
    sd["fc.weight"] = torch.zeros(1008, 2048)  # classifier head: ignored
    sd["fc.bias"] = torch.zeros(1008)
    ok_path = tmp_path / "with_fc.pth"
    torch.save(sd, str(ok_path))
    load_torch_inception_weights(variables, str(ok_path))

    sd["Mixed_9z.bogus.weight"] = torch.zeros(3)
    bad_path = tmp_path / "renamed.pth"
    torch.save(sd, str(bad_path))
    with pytest.raises(ValueError, match="unconsumed"):
        load_torch_inception_weights(variables, str(bad_path))
