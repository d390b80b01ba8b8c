"""MobileNetV1 WCT encoders: converter + folded-forward parity vs torch.

The reference's tools/convert_original_mobilenet_to_mine.py is dead code
(its model_MobileNet import was never committed); these tests pin our
working equivalent against a from-scratch torch MobileNetV1 built to the
exact layout the reference converter indexes (module.model.<block>.<sub>).
"""

import numpy as np
import pytest

from collaborative_distillation_tpu.models.mobilenet import (
    MOBILENET_BLOCKS,
    MOBILENET_TAP_WIDTHS,
    apply_mobilenet_encoder,
    convert_mobilenet_state_dict,
    fold_batchnorm,
    mobilenet_layer_table,
    mobilenet_param_shapes,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def _conv_bn(cin, cout, stride):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


def _conv_dw(cin, cout, stride):
    return nn.Sequential(
        nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False),
        nn.BatchNorm2d(cin), nn.ReLU(inplace=True),
        nn.Conv2d(cin, cout, 1, 1, 0, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


def _build_torch_mobilenet(seed=0):
    """Standard MobileNetV1 blocks 0..8 in the module.model.N.M layout the
    reference converter's tensor maps index."""
    torch.manual_seed(seed)
    blocks = [_conv_bn(*MOBILENET_BLOCKS[0])]
    blocks += [_conv_dw(*spec) for spec in MOBILENET_BLOCKS[1:]]
    model = nn.Sequential(*blocks)
    # randomize BN stats away from init so folding is actually exercised
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
    model.eval()
    return model


def _state_dict_with_reference_keys(model):
    return {f"module.model.{k}": v for k, v in model.state_dict().items()}


@pytest.mark.quick
def test_layer_table_matches_reference_tensor_maps():
    # the reference's tensor_map_k dicts (convert_original_mobilenet_to_mine
    # .py:11-49) list exactly these conv names per encoder
    expect = {
        1: ["conv11"],
        2: ["conv11", "conv21", "conv22", "conv31"],
        3: ["conv11", "conv21", "conv22", "conv31", "conv32",
            "conv41", "conv42", "conv51"],
        4: ["conv11", "conv21", "conv22", "conv31", "conv32", "conv41",
            "conv42", "conv51", "conv52", "conv61", "conv62", "conv71"],
        5: ["conv11", "conv21", "conv22", "conv31", "conv32", "conv41",
            "conv42", "conv51", "conv52", "conv61", "conv62", "conv71",
            "conv72", "conv81", "conv82", "conv91"],
    }
    for stage, names in expect.items():
        table = mobilenet_layer_table(stage)
        assert [l["name"] for l in table] == names
        assert table[-1]["cout"] == MOBILENET_TAP_WIDTHS[stage - 1]


@pytest.mark.quick
def test_fold_batchnorm_math():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    wf, bf = fold_batchnorm(w, gamma, beta, mean, var)
    # y = (conv(x) - mean)/sqrt(var+eps)*gamma + beta must equal
    # conv(x; wf) + bf for any conv output value z
    z = rng.normal(size=8).astype(np.float32)
    want = (z - mean) / np.sqrt(var + 1e-5) * gamma + beta
    scale = wf[0, 0, 0, :] / w[0, 0, 0, :]
    got = z * scale + bf
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_converted_shapes():
    model = _build_torch_mobilenet()
    sd = _state_dict_with_reference_keys(model)
    for stage in range(1, 6):
        tree = convert_mobilenet_state_dict(sd, stage)
        shapes = mobilenet_param_shapes(stage)
        assert set(tree) == set(shapes)
        for name, (wshape, bshape) in shapes.items():
            assert tree[name]["w"].shape == wshape, name
            assert tree[name]["b"].shape == bshape, name


@pytest.mark.parametrize("stage", [1, 2, 5])
def test_forward_matches_torch(stage):
    """Folded jax forward == torch eval forward, truncated at the stage's
    tap (depthwise BN of the end block), to conv-accumulation tolerance."""
    model = _build_torch_mobilenet()
    sd = _state_dict_with_reference_keys(model)
    tree = convert_mobilenet_state_dict(sd, stage)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    outs = apply_mobilenet_encoder(tree, x, stage)

    # torch truncation: run whole blocks, then the dw half of the end block
    end_block = {1: 0, 2: 2, 3: 4, 4: 6, 5: 8}[stage]
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        for b in range(end_block):
            xt = model[b](xt)
        xt = model[end_block][:3](xt) if end_block > 0 else model[0](xt)
    want = xt.numpy().transpose(0, 2, 3, 1)

    got = np.asarray(outs["out"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # taps exist at every lower stage with the documented widths
    for s in range(1, stage + 1):
        assert outs[f"relu{s}"].shape[-1] == MOBILENET_TAP_WIDTHS[s - 1]


def test_cli_roundtrip(tmp_path):
    from collaborative_distillation_tpu.cli.convert_mobilenet import main
    from collaborative_distillation_tpu.utils.torch_convert import load_tree_npz

    model = _build_torch_mobilenet()
    ckpt = tmp_path / "mobilenet_sgd.pth"
    torch.save({"state_dict": _state_dict_with_reference_keys(model)}, ckpt)
    assert main([str(ckpt), "--out-dir", str(tmp_path)]) == 0
    for stage in range(1, 6):
        tree = load_tree_npz(str(tmp_path / f"mobilenet_sgd_my_e{stage}.npz"))
        assert set(tree) == set(mobilenet_param_shapes(stage))
