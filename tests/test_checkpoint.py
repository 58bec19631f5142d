"""Checkpoint save/restore roundtrip + torch weight conversion tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from lsnet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from lsnet_tpu.train.optim import build_optimizer
    from lsnet_tpu.train.step import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx, _ = build_optimizer(0.01, 100, [8])
    state = TrainState(step=jnp.int32(7), params=params, batch_stats={},
                       opt_state=tx.init(params))
    path = save_checkpoint(str(tmp_path / "ck"), state, 7)
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, zero)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3))


def _fake_torch_resnet18_sd():
    """Minimal torchvision-style resnet18 state dict (stem + layer1.0 +
    layer2.0 with downsample)."""
    import torch
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k)

    def bn(name, c):
        sd[name + ".weight"] = torch.randn(c)
        sd[name + ".bias"] = torch.randn(c)
        sd[name + ".running_mean"] = torch.randn(c)
        sd[name + ".running_var"] = torch.rand(c) + 0.5
        sd[name + ".num_batches_tracked"] = torch.tensor(1)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    for blk in ("layer1.0", "layer1.1"):
        conv(blk + ".conv1", 64, 64, 3)
        bn(blk + ".bn1", 64)
        conv(blk + ".conv2", 64, 64, 3)
        bn(blk + ".bn2", 64)
    conv("layer2.0.conv1", 128, 64, 3)
    bn("layer2.0.bn1", 128)
    conv("layer2.0.conv2", 128, 128, 3)
    bn("layer2.0.bn2", 128)
    conv("layer2.0.downsample.0", 128, 64, 1)
    bn("layer2.0.downsample.1", 128)
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)
    return sd


def test_torch_conversion_mapping():
    torch = pytest.importorskip("torch")
    from lsnet_tpu.train.checkpoint import convert_torch_resnet

    sd = _fake_torch_resnet18_sd()
    params, stats = convert_torch_resnet(sd, depth=18)
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    assert params["layer1_0"]["conv2"]["kernel"].shape == (3, 3, 64, 64)
    assert params["layer2_0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)
    np.testing.assert_allclose(np.asarray(stats["bn1"]["mean"]),
                               sd["bn1.running_mean"].numpy())
    assert "fc" not in params


def test_frozen_bn_matches_torch_eval():
    torch = pytest.importorskip("torch")
    from lsnet_tpu.models.layers import FrozenBatchNorm

    c = 8
    x = np.random.RandomState(0).randn(1, 4, 4, c).astype(np.float32)
    gamma = np.random.RandomState(1).rand(c).astype(np.float32) + 0.5
    beta = np.random.RandomState(2).randn(c).astype(np.float32)
    mean = np.random.RandomState(3).randn(c).astype(np.float32)
    var = np.random.RandomState(4).rand(c).astype(np.float32) + 0.5

    mod = FrozenBatchNorm()
    variables = {"params": {"scale": jnp.array(gamma), "bias": jnp.array(beta)},
                 "batch_stats": {"mean": jnp.array(mean),
                                 "var": jnp.array(var)}}
    got = np.asarray(mod.apply(variables, jnp.array(x)))

    tbn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(gamma))
        tbn.bias.copy_(torch.from_numpy(beta))
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
        want = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
