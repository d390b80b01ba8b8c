"""Training stack: loss graphs, optimizer steps, DP equivalence, checkpoints,
pruning initializer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from collaborative_distillation_tpu.models import (
    decoder_spec,
    encoder_spec,
    init_params,
)
from collaborative_distillation_tpu.train.losses import (
    kd2sd_losses,
    sd_reconstruct_losses,
    se_distill_losses,
)
from collaborative_distillation_tpu.train.prune import l1_keep_indices, prune_to_student
from collaborative_distillation_tpu.train.trainer import TrainConfig, Trainer
from collaborative_distillation_tpu.parallel.mesh import make_mesh


STAGE = 2  # small enough for fast CPU tests, deep enough to cover pools/taps


def _setup(mode):
    k = STAGE
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    be_spec = encoder_spec("original", k)
    bd_spec = decoder_spec("original", k)
    se_spec = encoder_spec("16x", k, aux=True)
    be = init_params(be_spec, ks[0])
    bd = init_params(bd_spec, ks[1])
    se = init_params(se_spec, ks[2])
    if mode == "wct_se":
        return se, {"be": be, "bd": bd}
    if mode == "wct_sd":
        sd = init_params(decoder_spec("16x", k), ks[3])
        return sd, {"be": be, "se": se}
    sd = init_params(decoder_spec("16x", k, aux=True), ks[4])
    return sd, {"be": be, "bd": bd, "se": se}


def _batch(rng, n=2, hw=32):
    return jnp.asarray(rng.random((n, hw, hw, 3), dtype=np.float32))


@pytest.mark.parametrize("mode,keys", [
    ("wct_se", {"feat", "pixl", "perc"}),
    ("wct_sd", {"pixl", "perc"}),
    ("wct_sd_kd2sd", {"pixl", "perc", "kd"}),
])
def test_loss_graphs_finite_and_named(rng, mode, keys):
    from collaborative_distillation_tpu.train.trainer import make_loss_fn

    student, frozen = _setup(mode)
    cfg = TrainConfig(mode=mode, stage=STAGE)
    fn, weights = make_loss_fn(cfg)
    losses, rec = fn(student, frozen, _batch(rng))
    assert set(losses) == keys == set(weights)
    for name, val in losses.items():
        assert np.isfinite(float(val)), name
    assert rec.shape == (2, 32, 32, 3)


def test_gradients_only_flow_to_student(rng):
    """Frozen teacher params must receive exactly zero gradient."""
    student, frozen = _setup("wct_se")
    cfg = TrainConfig(mode="wct_se", stage=STAGE)
    from collaborative_distillation_tpu.train.trainer import make_loss_fn

    fn, weights = make_loss_fn(cfg)
    batch = _batch(rng)

    def total(p, f):
        losses, _ = fn(p, f, batch)
        return sum(weights[k] * v for k, v in losses.items())

    g_student, g_frozen = jax.grad(total, argnums=(0, 1))(student, frozen)
    s_norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_student)]
    f_norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_frozen)]
    assert max(f_norms) == 0.0
    assert sum(1 for n in s_norms if n > 0) > len(s_norms) // 2


@pytest.mark.parametrize("mode", ["wct_se", "wct_sd", "wct_sd_kd2sd"])
def test_train_step_reduces_loss(rng, mode):
    student, frozen = _setup(mode)
    cfg = TrainConfig(mode=mode, stage=STAGE, lr=1e-3)
    trainer = Trainer(cfg, student, frozen)
    batch = _batch(rng)
    first = None
    for _ in range(8):
        losses, _ = trainer.train_step(batch)
        total = sum(float(v) * trainer.loss_weights[k] for k, v in losses.items())
        if first is None:
            first = total
    assert total < first, (first, total)


def test_dp_matches_single_device(rng):
    """The data-parallel step must produce identical params to single-device
    (same global batch; gradient averaging is exact)."""
    student, frozen = _setup("wct_se")
    cfg = TrainConfig(mode="wct_se", stage=STAGE, lr=1e-3)
    batch = _batch(rng, n=4)

    t1 = Trainer(cfg, jax.tree.map(jnp.copy, student), frozen)
    t1.train_step(batch)

    mesh = make_mesh(data=4)
    t2 = Trainer(cfg, jax.tree.map(jnp.copy, student), frozen, mesh=mesh)
    t2.train_step(batch)

    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(rng, tmp_path):
    student, frozen = _setup("wct_se")
    cfg = TrainConfig(mode="wct_se", stage=STAGE)
    trainer = Trainer(cfg, student, frozen)
    batch = _batch(rng)
    trainer.train_step(batch)
    path = str(tmp_path / "ckpt")
    trainer.save(path, epoch=3, step=17)

    trainer2 = Trainer(cfg, _setup("wct_se")[0], frozen)
    meta = trainer2.restore(path)
    assert meta["epoch"] == 3 and meta["step"] == 17
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trainer must keep optimizing from the same state
    l1, _ = trainer.train_step(batch)
    l2, _ = trainer2.train_step(batch)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=1e-5)


def test_l1_keep_indices(rng):
    w = np.zeros((3, 3, 2, 4), np.float32)
    w[..., 1] = 3.0
    w[..., 3] = 2.0
    w[..., 0] = 1.0
    keep = l1_keep_indices(w, 2)
    np.testing.assert_array_equal(keep, [1, 3])


def test_prune_to_student_shapes_and_selection(rng):
    teacher_spec = encoder_spec("original", 2)
    student_spec = encoder_spec("16x", 2, aux=True)
    teacher = jax.tree.map(np.asarray, init_params(teacher_spec, jax.random.key(5)))
    student = prune_to_student(teacher, student_spec)
    expected = student_spec.param_shapes()
    for name, (wshape, bshape) in expected.items():
        assert student[name]["w"].shape == wshape, name
        assert student[name]["b"].shape == bshape, name
    # kept filters of conv11 are exactly the top-16 by L1 norm
    w = teacher["conv11"]["w"]
    keep = l1_keep_indices(w, 16)
    np.testing.assert_array_equal(student["conv11"]["w"], w[:, :, :, keep])
    np.testing.assert_array_equal(student["conv11"]["b"], teacher["conv11"]["b"][keep])
    # next layer's columns follow the previous layer's kept rows
    np.testing.assert_array_equal(
        student["conv12"]["w"],
        teacher["conv12"]["w"][:, :, keep, :][
            :, :, :, l1_keep_indices(teacher["conv12"]["w"][:, :, keep, :], 16)],
    )


def test_prune_decoder_first_layer_input_channels(rng):
    """Decoder conv21 has teacher input 128 -> student input 32: pruned by
    input-channel L1 (prune.py:117-121)."""
    teacher_spec = decoder_spec("original", 2)
    student_spec = decoder_spec("16x", 2)
    teacher = jax.tree.map(np.asarray, init_params(teacher_spec, jax.random.key(6)))
    student = prune_to_student(teacher, student_spec)
    for name, (wshape, bshape) in student_spec.param_shapes().items():
        assert student[name]["w"].shape == wshape, name


def test_orbax_checkpoint_roundtrip(tmp_path):
    from collaborative_distillation_tpu.utils.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    tree = {"params": {"conv": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                                "b": np.ones(4, np.float32)}},
            "step": np.int32(7)}
    path = str(tmp_path / "ockpt")
    save_checkpoint_orbax(path, tree)
    out = load_checkpoint_orbax(path, tree)
    np.testing.assert_array_equal(out["params"]["conv"]["w"], tree["params"]["conv"]["w"])
    assert int(out["step"]) == 7


def test_mixed_precision_training_step(rng):
    """compute_dtype='bfloat16': params/opt-state stay f32, losses finite,
    loss decreases over steps, and the step tracks the f32 trainer closely
    at the start of training (same init, same batch)."""
    import jax

    from collaborative_distillation_tpu.models.specs import (
        decoder_spec, encoder_spec)
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.train.trainer import (
        TrainConfig, Trainer)

    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    be = init_params(encoder_spec("original", 1), k1)
    bd = init_params(decoder_spec("original", 1), k2)
    se = init_params(encoder_spec("16x", 1, aux=True), k3)
    batch = rng.random((2, 32, 32, 3)).astype(np.float32)

    cfg16 = TrainConfig(mode="wct_se", stage=1, batch_size=2,
                        compute_dtype="bfloat16")
    # independent copies: the jit'd step DONATES its params buffers
    tr16 = Trainer(cfg16, jax.tree.map(jnp.copy, se), {"be": be, "bd": bd})
    tr32 = Trainer(TrainConfig(mode="wct_se", stage=1, batch_size=2),
                   jax.tree.map(jnp.copy, se), {"be": be, "bd": bd})

    l16_first, rec = tr16.train_step(batch)
    l32_first, _ = tr32.train_step(batch)
    assert rec.dtype == jnp.float32
    for name, v in l16_first.items():
        v16, v32 = float(v), float(l32_first[name])
        assert np.isfinite(v16)
        assert abs(v16 - v32) / max(abs(v32), 1e-6) < 0.1, (name, v16, v32)
    # master weights stay f32
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(tr16.params))
    first = sum(float(v) for v in l16_first.values())
    for _ in range(8):
        losses, _ = tr16.train_step(batch)
    assert sum(float(v) for v in losses.values()) < first


def test_mixed_precision_dp_matches_single_device(rng):
    """bf16 DP step == bf16 single-device step (gradient psum on the f32
    master-weight side; batch sharded over 'data')."""
    import jax

    from collaborative_distillation_tpu.models.specs import (
        decoder_spec, encoder_spec)
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.parallel.mesh import make_mesh
    from collaborative_distillation_tpu.train.trainer import (
        TrainConfig, Trainer)

    k1, k2, k3 = jax.random.split(jax.random.key(9), 3)
    be = init_params(encoder_spec("original", 1), k1)
    bd = init_params(decoder_spec("original", 1), k2)
    se = init_params(encoder_spec("16x", 1, aux=True), k3)
    batch = rng.random((4, 32, 32, 3)).astype(np.float32)
    cfg = TrainConfig(mode="wct_se", stage=1, batch_size=4,
                      compute_dtype="bfloat16")
    single = Trainer(cfg, jax.tree.map(jnp.copy, se), {"be": be, "bd": bd})
    dp = Trainer(cfg, jax.tree.map(jnp.copy, se), {"be": be, "bd": bd},
                 mesh=make_mesh(data=4))
    ls, _ = single.train_step(batch)
    ld, _ = dp.train_step(batch)
    for name in ls:
        # bf16 forward: psum reduction order differs slightly across shards
        np.testing.assert_allclose(float(ld[name]), float(ls[name]),
                                   rtol=2e-2)
    for a, b in zip(jax.tree.leaves(single.params), jax.tree.leaves(dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_lr_schedule_survives_resume(rng, tmp_path):
    """Cosine-decay lr rides optax's step count in opt_state: a trainer
    restored mid-run continues the schedule where it left off (same update
    as an uninterrupted trainer), rather than restarting at peak lr."""
    import jax

    from collaborative_distillation_tpu.models.specs import (
        decoder_spec, encoder_spec)
    from collaborative_distillation_tpu.models.vgg import init_params
    from collaborative_distillation_tpu.train.trainer import (
        TrainConfig, Trainer)

    k1, k2 = jax.random.split(jax.random.key(11))
    se = init_params(encoder_spec("16x", 1, aux=True), k1)
    sd = init_params(decoder_spec("16x", 1), k2)
    batch = rng.random((2, 32, 32, 3)).astype(np.float32)
    cfg = TrainConfig(mode="wct_sd", stage=1, lw_perc=0.0, lr=1e-3,
                      lr_final=1e-5, lr_decay_steps=10)

    ref = Trainer(cfg, jax.tree.map(jnp.copy, sd), {"se": se})
    for _ in range(3):
        ref.train_step(batch)
    path = str(tmp_path / "mid")
    ref.save(path, epoch=1, step=3)
    for _ in range(2):
        ref.train_step(batch)

    res = Trainer(cfg, jax.tree.map(jnp.copy, sd), {"se": se})
    res.restore(path)
    for _ in range(2):
        losses, _ = res.train_step(batch)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert np.isfinite(float(losses["pixl"]))
