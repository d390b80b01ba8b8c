"""Offline tool CLIs: prune, plot_loss parser, activation normalization,
image prep."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from collaborative_distillation_tpu.models.specs import encoder_spec
from collaborative_distillation_tpu.models.vgg import init_params
from collaborative_distillation_tpu.models.zoo import load_stage_params
from collaborative_distillation_tpu.utils.torch_convert import save_tree_npz


def _save_params(params, path):
    save_tree_npz({k: {n: np.asarray(v) for n, v in e.items()}
                   for k, e in params.items()}, path)


def test_prune_cli_roundtrip(tmp_path):
    from collaborative_distillation_tpu.cli.prune import main

    t_spec = encoder_spec("original", 2)
    teacher = init_params(t_spec, jax.random.key(0))
    tpath = str(tmp_path / "e2.npz")
    _save_params(teacher, tpath)
    out = str(tmp_path / "e2_base.npz")
    assert main(["--teacher", tpath, "--kind", "encoder", "--stage", "2",
                 "--output", out]) == 0
    s_spec = encoder_spec("16x", 2, aux=True)
    student = load_stage_params(out, s_spec)  # validates shapes
    assert student["conv21"]["w"].shape == (3, 3, 16, 32)


def test_plot_loss_parser(tmp_path):
    from collaborative_distillation_tpu.cli.plot_loss import main, parse_log

    log = tmp_path / "log.txt"
    log.write_text(
        "[abc 1 2026/01/01-00:00:00] args: {...}\n"
        "[abc 1 2026/01/01-00:00:01] E1S0 feat (*10): 5.657 | pixl (*1): 0.197 (23.45 s/step)\n"
        "[abc 1 2026/01/01-00:00:02] E1S10 feat (*10): 5.535 | pixl (*1): 0.190 (17.47 s/step)\n"
        "[abc 1 2026/01/01-00:00:03] epoch 1 done; checkpoint at x.npz\n")
    curves = parse_log(str(log))
    assert set(curves) == {"feat", "pixl"}
    assert [v for _, v in curves["feat"]] == [5.657, 5.535]
    out = str(tmp_path / "loss.png")
    assert main([str(log), "--out", out]) == 0
    assert os.path.getsize(out) > 0


def test_plot_loss_empty_log(tmp_path):
    from collaborative_distillation_tpu.cli.plot_loss import main

    log = tmp_path / "empty.txt"
    log.write_text("nothing here\n")
    assert main([str(log), "--out", str(tmp_path / "x.png")]) == 1


def test_normalize_encoder_unit_mean_activation(rng):
    from collaborative_distillation_tpu.cli.normalize_vgg import normalize_encoder
    from collaborative_distillation_tpu.models.vgg import apply_encoder
    import jax.numpy as jnp

    spec = encoder_spec("original", 2)
    params = init_params(spec, jax.random.key(1))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32) for _ in range(2)]
    normed = normalize_encoder(params, spec, batches)
    # every conv layer's mean post-relu activation over the set must be ~1
    from collaborative_distillation_tpu.ops.conv import conv1x1, conv3x3, max_pool_2x2
    for target in [l.name for l in spec.layers]:
        means, total = None, 0
        for b in batches:
            h = jnp.asarray(b)
            h = conv1x1(h, normed["conv0"]["w"], normed["conv0"]["b"])
            for layer in spec.layers:
                h2 = conv3x3(h, normed[layer.name]["w"], normed[layer.name]["b"])
                if layer.name == target:
                    m = np.asarray(jnp.mean(h2, axis=(0, 1, 2))) * b.shape[0]
                    means = m if means is None else means + m
                    total += b.shape[0]
                    break
                h = h2
                if layer.pool_after:
                    h = max_pool_2x2(h)
        m = means / total
        # dead ReLU filters (possible under random init) stay at 0 — scaling
        # a never-positive pre-activation can't revive it; real VGG weights
        # have none. All live filters must normalize to 1.
        live = m > 1e-6
        assert live.mean() > 0.5
        # filters above the relative floor normalize to exactly 1; near-dead
        # ones are floored (end below 1) instead of receiving an exploding
        # 1/eps rescale (normalize_vgg.py rel_floor).
        at_one = np.isclose(m, 1.0, rtol=1e-3)
        assert at_one.mean() > 0.5
        assert (m[live] <= 1.0 + 1e-3).all()


def test_imgtools(tmp_path):
    from collaborative_distillation_tpu.cli.imgtools import main

    arr = (np.random.default_rng(0).random((60, 100, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "a.jpg")
    assert main(["crop-center", str(tmp_path)]) == 0
    assert Image.open(tmp_path / "a_cropped.jpg").size == (60, 60)
    assert main(["resize", str(tmp_path), "--size", "32", "16"]) == 0
    assert Image.open(tmp_path / "a_resized.jpg").size == (32, 16)


def test_eval_cli(tmp_path, weights_root):
    """Per-stage reconstruction PSNR tool runs on the converted 16x weights;
    shallow stages must reconstruct better than deep ones."""
    from collaborative_distillation_tpu.cli.eval import main, psnr

    rng = np.random.default_rng(3)
    for i in range(2):
        Image.fromarray((rng.random((80, 80, 3)) * 255).astype(np.uint8)
                        ).save(tmp_path / f"{i}.jpg")
    rc = main(["--mode", "16x", "--images", str(tmp_path), "--n_images", "2",
               "--size", "64", "--stages", "2", "1",
               "--weights_root", weights_root])
    assert rc == 0
    # psnr helper sanity
    a = np.zeros((4, 4)); b = np.full((4, 4), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_train_stage0_runs_all_stages(monkeypatch):
    """--stage 0 loops 5..1 through _run_stage and rejects per-stage weight
    overrides (they would silently apply to every stage)."""
    import pytest
    from collaborative_distillation_tpu.cli import train as t

    ran = []
    monkeypatch.setattr(t, "_run_stage", lambda args, k: ran.append(k) or 0)
    assert t.main(["--mode", "wct_se", "--stage", "0"]) == 0
    assert ran == [5, 4, 3, 2, 1]
    with pytest.raises(SystemExit, match="single stage"):
        t.main(["--mode", "wct_se", "--stage", "0", "--SE", "x.npz"])
    # a failing stage stops the chain
    ran.clear()
    monkeypatch.setattr(t, "_run_stage",
                        lambda args, k: ran.append(k) or (1 if k == 4 else 0))
    assert t.main(["--mode", "wct_se", "--stage", "0"]) == 1
    assert ran == [5, 4]


def test_ssim_properties(rng):
    """SSIM: 1.0 on identity, monotone under growing noise, penalizes
    structural scrambling far more than PSNR-equivalent noise."""
    from collaborative_distillation_tpu.cli.eval import ssim

    x = rng.random((48, 48, 3))
    assert abs(ssim(x, x) - 1.0) < 1e-9
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1)
    big = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1)
    s_small, s_big = ssim(x, small), ssim(x, big)
    assert 1.0 > s_small > s_big
    # shuffling pixels keeps the histogram (and roughly the MSE-vs-mean)
    # but destroys structure: SSIM must fall off a cliff
    flat = x.reshape(-1, 3).copy()
    rng.shuffle(flat, axis=0)
    assert ssim(x, flat.reshape(x.shape)) < 0.2
    # batch form agrees with the mean of singles
    a = rng.random((2, 32, 32, 3))
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    batched = ssim(a, b)
    singles = (ssim(a[0], b[0]) + ssim(a[1], b[1])) / 2
    assert abs(batched - singles) < 1e-9


def test_stylize_cli_flag_surface(weights_root, tmp_path):
    """The reference WCT.py flag surface end to end: picked marks select one
    pair out of a 2x2 grid, --alpha/--num_run/--content_size/--style_size
    apply, and --synthesis stylizes noise from the texture dir."""
    import os

    from collaborative_distillation_tpu.cli.stylize import main

    rng = np.random.default_rng(0)
    cdir, sdir, tdir = tmp_path / "c", tmp_path / "s", tmp_path / "t"
    for d in (cdir, sdir, tdir):
        d.mkdir()
    for name, d in [("cat", cdir), ("dog", cdir), ("blue", sdir),
                    ("red", sdir), ("tex", tdir)]:
        Image.fromarray((rng.random((96, 80, 3)) * 255).astype(np.uint8)
                        ).save(d / f"{name}.jpg")
    outf = str(tmp_path / "out")
    rc = main(["--mode", "16x", "--contentPath", str(cdir),
               "--stylePath", str(sdir), "--outf", outf, "--debug",
               "--weights_root", weights_root,
               "--picked_content_mark", "cat", "--picked_style_mark", "blue",
               "--alpha", "0.5", "--num_run", "2",
               "--content_size", "64", "--style_size", "64"])
    assert rc == 0
    outs = sorted(f for f in os.listdir(outf) if f.endswith(".jpg"))
    # the picked pair only, reference naming content+style.jpg (log-mark
    # prefixed like the reference's experiment dirs)
    assert len(outs) == 1 and outs[0].endswith("cat+blue.jpg")

    outf2 = str(tmp_path / "out2")
    rc = main(["--mode", "16x", "--stylePath", str(sdir), "--outf", outf2,
               "--debug", "--weights_root", weights_root, "--synthesis",
               "--texturePath", str(tdir), "--style_size", "64"])
    assert rc == 0
    assert any(f.endswith(".jpg") for f in os.listdir(outf2))
