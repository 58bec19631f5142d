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


@pytest.mark.slow
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


# -------------------- train-meta sidecar / deploy-policy arming (r5) --------

def test_checkpoint_meta_sidecar_roundtrip(tmp_path):
    """A nearest_ste-trained save records its spec; eval restore arms the
    matching deploy default (nearest) without touching explicit choices."""
    from lsnet_tpu.ops import flat_deform as fd
    from lsnet_tpu.train.checkpoint import (load_deploy_meta,
                                            restore_eval_state,
                                            save_checkpoint)
    from lsnet_tpu.train.step import TrainState

    params = {"w": jnp.arange(4.0)}
    state = TrainState(step=jnp.int32(3), params=params, batch_stats={},
                       opt_state=())
    prev = (fd.SAMPLING[0], dict(fd.SAMPLING_POLICY),
            fd.INFERENCE_SAMPLING[0], fd.INFERENCE_REFINE_TAPS[0])
    try:
        fd.set_sampling("nearest_ste")
        path = save_checkpoint(str(tmp_path / "ck"), state, 3)
        meta = load_deploy_meta(path)
        assert meta == {"dcn_sampling_train": "nearest_ste"}
        # eval-side restore arms the deploy default
        fd.set_sampling(None)            # back to implicit
        fd.INFERENCE_SAMPLING[0] = "backbone=nearest"
        restored = restore_eval_state(
            path, {"params": {"w": jnp.zeros(4)}})
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(4.0))
        assert fd.INFERENCE_SAMPLING[0] == "nearest"
        # pre-r5 checkpoints (no sidecar) leave the default untouched
        assert load_deploy_meta(str(tmp_path / "nope")) is None
        fd.arm_deploy_policy(None)
        assert fd.INFERENCE_SAMPLING[0] == "nearest"
    finally:
        fd.SAMPLING[0] = prev[0]
        fd.SAMPLING_POLICY.clear()
        fd.SAMPLING_POLICY.update(prev[1])
        fd._SAMPLING_EXPLICIT[0] = False
        fd.INFERENCE_SAMPLING[0] = prev[2]
        fd.INFERENCE_REFINE_TAPS[0] = prev[3]


def test_deploy_sampling_spec_mapping():
    from lsnet_tpu.ops import flat_deform as fd

    prev = fd.INFERENCE_SAMPLING[0]
    fd.INFERENCE_SAMPLING[0] = "backbone=nearest"
    try:
        # global ste train -> global nearest deploy
        assert fd.deploy_sampling_spec("nearest_ste") == "nearest"
        # per-site ste merges with the shipped bilinear-site default
        assert (fd.deploy_sampling_spec("tower=nearest_ste")
                == "backbone=nearest,tower=nearest")
        # pure-bilinear train keeps the shipped default
        assert fd.deploy_sampling_spec("bilinear") == "backbone=nearest"
        assert fd.deploy_sampling_spec(None) == "backbone=nearest"
        # shipped default fully bilinear -> nothing to arm
        fd.INFERENCE_SAMPLING[0] = "bilinear"
        assert fd.deploy_sampling_spec("bilinear") is None
        assert fd.deploy_sampling_spec("nearest_ste") == "nearest"
    finally:
        fd.INFERENCE_SAMPLING[0] = prev


def test_train_meta_records_taps(monkeypatch):
    from lsnet_tpu.ops import flat_deform as fd
    from lsnet_tpu.train.checkpoint import train_meta

    monkeypatch.setenv("LSNET_REFINE_TAPS", "5")
    meta = train_meta()
    assert meta["refine_taps_train"] == "5"
    prev = fd.INFERENCE_REFINE_TAPS[0]
    try:
        fd.arm_deploy_policy(meta)
        assert fd.INFERENCE_REFINE_TAPS[0] == "5"
    finally:
        fd.INFERENCE_REFINE_TAPS[0] = prev


# -------------------- mmdet-keyspace converter (VERDICT r1 item 5) ----------

def _gen_mmdet_backbone_sd(depth, base=16, block_type="resnet", groups=1,
                           base_width=4, scales=4, dcn_stages=(),
                           deep_stem=False, prefix=""):
    """Synthesize an mmdet-style backbone state dict with shape-exact
    tensors for our tiny ``base_channels`` variants (torch OIHW layout,
    mmdet naming: `code/mmdet/models/backbones/{resnet,resnext,res2net}.py`,
    DCN keys `code/mmdet/ops/dcn/deform_conv.py:410-435`)."""
    import torch

    from lsnet_tpu.models.backbones.resnet import ARCH_SETTINGS
    sd = {}

    def conv(name, o, i, k):
        sd[prefix + name + ".weight"] = torch.randn(o, i, k, k)

    def bn(name, c):
        for leaf, t in (("weight", torch.randn(c)), ("bias", torch.randn(c)),
                        ("running_mean", torch.randn(c)),
                        ("running_var", torch.rand(c) + 0.5),
                        ("num_batches_tracked", torch.tensor(1))):
            sd[prefix + name + "." + leaf] = t

    if deep_stem:
        conv("stem.0", base // 2, 3, 3)
        bn("stem.1", base // 2)
        conv("stem.3", base // 2, base // 2, 3)
        bn("stem.4", base // 2)
        conv("stem.6", base, base // 2, 3)
        bn("stem.7", base)
    else:
        conv("conv1", base, 3, 7)
        bn("bn1", base)

    _, stage_blocks = ARCH_SETTINGS[depth]
    prev = base
    for s, nblocks in enumerate(stage_blocks):
        planes = base * 2 ** s
        out = planes * 4
        dcn = s in dcn_stages
        for b in range(nblocks):
            blk = f"layer{s + 1}.{b}"
            if block_type == "res2net":
                width = int(planes * base_width / base)
                conv(f"{blk}.conv1", width * scales, prev, 1)
                bn(f"{blk}.bn1", width * scales)
                for i in range(scales - 1):
                    conv(f"{blk}.convs.{i}", width, width, 3)
                    if dcn:
                        conv(f"{blk}.convs.{i}.conv_offset", 27, width, 3)
                        sd[prefix + f"{blk}.convs.{i}.conv_offset.bias"] = \
                            torch.zeros(27)
                    bn(f"{blk}.bns.{i}", width)
                conv(f"{blk}.conv3", out, width * scales, 1)
                bn(f"{blk}.bn3", out)
                if b == 0:
                    # avg_down: Sequential(AvgPool, Conv, BN)
                    conv(f"{blk}.downsample.1", out, prev, 1)
                    bn(f"{blk}.downsample.2", out)
            else:
                width = (planes if groups == 1
                         else int(planes * base_width / base) * groups)
                conv(f"{blk}.conv1", width, prev, 1)
                bn(f"{blk}.bn1", width)
                conv(f"{blk}.conv2", width, width // groups, 3)
                if dcn:
                    conv(f"{blk}.conv2.conv_offset", 27, width, 3)
                    sd[prefix + f"{blk}.conv2.conv_offset.bias"] = \
                        torch.zeros(27)
                bn(f"{blk}.bn2", width)
                conv(f"{blk}.conv3", out, width, 1)
                bn(f"{blk}.bn3", out)
                if b == 0:
                    conv(f"{blk}.downsample.0", out, prev, 1)
                    bn(f"{blk}.downsample.1", out)
            prev = out
    return sd


def _roundtrip(tmp_path, sd, backbone):
    """Save a torch sd, load it into an inited flax backbone, assert merge."""
    import torch

    import jax
    from lsnet_tpu.train.checkpoint import load_pretrained_backbone
    path = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": sd}, path)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = backbone.init(jax.random.PRNGKey(0), x)
    wrapped = {"params": {"backbone": variables["params"]},
               "batch_stats": {"backbone": variables.get("batch_stats", {})}}
    return load_pretrained_backbone(wrapped, path)


@pytest.mark.slow
def test_convert_mmdet_prefixed_resnext_dcn(tmp_path):
    pytest.importorskip("torch")
    from lsnet_tpu.models.backbones.resnet import ResNet

    sd = _gen_mmdet_backbone_sd(50, base=16, block_type="resnext", groups=4,
                                base_width=4, dcn_stages=(1, 2, 3),
                                prefix="backbone.")
    # full-model dicts carry neck/head keys too; they must be skipped
    import torch
    sd["neck.lateral_convs.0.conv.weight"] = torch.randn(8, 8, 1, 1)
    sd["bbox_head.cls_out.weight"] = torch.randn(4, 8, 1, 1)
    bb = ResNet(depth=50, block_type="resnext", groups=4, base_width=4,
                base_channels=16, stage_with_dcn=(False, True, True, True))
    merged = _roundtrip(tmp_path, sd, bb)
    p = merged["params"]["backbone"]
    # DCN main weight landed on the pack's raw 'weight' param (HWIO)
    w = np.asarray(p["layer2_0"]["conv2"]["weight"])
    src = sd["backbone.layer2.0.conv2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(w, src)
    # conv_offset landed on the nn.Conv kernel
    k = np.asarray(p["layer2_0"]["conv2"]["conv_offset"]["kernel"])
    np.testing.assert_allclose(
        k, sd["backbone.layer2.0.conv2.conv_offset.weight"].numpy()
        .transpose(2, 3, 1, 0))


@pytest.mark.slow
def test_convert_res2net_v1d_dcn(tmp_path):
    pytest.importorskip("torch")
    from lsnet_tpu.models.backbones.resnet import ResNet

    sd = _gen_mmdet_backbone_sd(50, base=16, block_type="res2net",
                                base_width=8, scales=4,
                                dcn_stages=(1, 2, 3), deep_stem=True)
    bb = ResNet(depth=50, block_type="res2net", base_width=8, scales=4,
                base_channels=16, deep_stem=True,
                stage_with_dcn=(False, True, True, True))
    merged = _roundtrip(tmp_path, sd, bb)
    p = merged["params"]["backbone"]
    s = merged["batch_stats"]["backbone"]
    np.testing.assert_allclose(
        np.asarray(p["stem_conv1"]["kernel"]),
        sd["stem.0.weight"].numpy().transpose(2, 3, 1, 0))
    # scale-branch conv landed (DCN pack weight)
    np.testing.assert_allclose(
        np.asarray(p["layer3_0"]["conv2_1"]["weight"]),
        sd["layer3.0.convs.1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(s["layer3_0"]["bn2_1"]["mean"]),
        sd["layer3.0.bns.1.running_mean"].numpy())
    # avg-down downsample conv mapped by tensor rank
    assert np.asarray(p["layer2_0"]["downsample_conv"]["kernel"]).shape[:2] \
        == (1, 1)


def test_convert_rejects_unknown_keys():
    pytest.importorskip("torch")
    import torch

    from lsnet_tpu.train.checkpoint import convert_torch_backbone
    sd = {"conv1.weight": torch.randn(16, 3, 7, 7),
          "mystery.module.weight": torch.randn(4, 4, 3, 3)}
    with pytest.raises(ValueError, match="mystery"):
        convert_torch_backbone(sd)
