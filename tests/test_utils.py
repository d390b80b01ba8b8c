"""Utility coverage: logging, image IO, profiling timers."""

import os
import time

import numpy as np
import pytest

from collaborative_distillation_tpu.utils.image import (
    load_image_array,
    save_image,
    save_image_grid,
)
from collaborative_distillation_tpu.utils.logging import (
    Experiment,
    LogPrinter,
    LossMeter,
    Throughput,
    git_code_id,
    resolve_path,
)
from collaborative_distillation_tpu.utils.profiling import StepTimer, trace

pytestmark = pytest.mark.quick  # fast regression tier (pytest -m quick)


def test_save_and_load_image_roundtrip(tmp_path, rng):
    arr = rng.random((20, 30, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(arr, p)
    back = load_image_array(p)
    assert back.shape == arr.shape
    np.testing.assert_allclose(back, arr, atol=2 / 255)


def test_load_image_array_resize(tmp_path, rng):
    save_image(rng.random((40, 80, 3)).astype(np.float32), str(tmp_path / "y.png"))
    out = load_image_array(str(tmp_path / "y.png"), resize_shorter=20)
    assert out.shape == (20, 40, 3)


def test_save_image_grid(tmp_path, rng):
    batch = rng.random((5, 8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "grid.png")
    save_image_grid(batch, p, nrow=3, pad=1)
    from PIL import Image
    w, h = Image.open(p).size
    assert w == 3 * 9 + 1 and h == 2 * 9 + 1  # 3 cols x 2 rows + padding


def test_loss_meter_ema():
    m = LossMeter(momentum=0.5)
    m.update("a", 2.0)
    m.update("a", 4.0)
    assert m.values["a"] == pytest.approx(3.0)
    assert "a: 3" in m.format()
    m.update("tiny", 4.2e-5)
    assert "tiny: 4.2e-05" in m.format()  # sub-millesimal losses stay visible


def test_log_printer_writes_file(tmp_path):
    f = open(tmp_path / "log.txt", "w")
    log = LogPrinter(f, "expid", to_screen=False)
    log("hello")
    f.flush()
    text = (tmp_path / "log.txt").read_text()
    assert "hello" in text and "expid" in text


def test_resolve_path_glob(tmp_path):
    (tmp_path / "only.npz").write_bytes(b"x")
    assert resolve_path(str(tmp_path / "*.npz")).endswith("only.npz")
    (tmp_path / "two.npz").write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        resolve_path(str(tmp_path / "*.npz"))
    assert resolve_path("") == ""


def test_experiment_layout(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    exp = Experiment("proj", to_screen=False)
    assert os.path.isdir(exp.images_dir) and os.path.isdir(exp.weights_dir)
    assert exp.ckpt_path().endswith(".npz")
    exp.log("line")


def test_git_code_id_returns_string():
    cid = git_code_id()
    assert isinstance(cid, str) and cid


def test_throughput_and_step_timer():
    tp = Throughput()
    tp.tick(1_000_000)
    assert "MPix/s" in tp.report()
    st = StepTimer()
    with st:
        time.sleep(0.01)
    assert "p50" in st.report()


def test_trace_noop_without_logdir():
    with trace(None):
        pass  # must not require jax profiler setup


def test_persistent_cache_config(tmp_path, monkeypatch):
    """enable_persistent_cache points JAX at the env dir, idempotently."""
    from collaborative_distillation_tpu.utils import jaxconfig

    monkeypatch.setattr(jaxconfig, "_done", False)
    monkeypatch.setattr(jaxconfig, "_configured", None)
    monkeypatch.setenv("CD_TPU_COMPILATION_CACHE_DIR", str(tmp_path / "xla"))
    d = jaxconfig.enable_persistent_cache()
    assert d == str(tmp_path / "xla") and __import__("os").path.isdir(d)
    import jax
    assert jax.config.jax_compilation_cache_dir == d
    # second call is a no-op returning the same dir, even if env changes
    monkeypatch.setenv("CD_TPU_COMPILATION_CACHE_DIR", "elsewhere")
    assert jaxconfig.enable_persistent_cache() == d


def test_persistent_cache_env_disable(monkeypatch):
    from collaborative_distillation_tpu.utils import jaxconfig

    monkeypatch.setattr(jaxconfig, "_done", False)
    monkeypatch.setattr(jaxconfig, "_configured", None)
    monkeypatch.setenv("CD_TPU_COMPILATION_CACHE_DIR", "off")
    assert jaxconfig.enable_persistent_cache() is None
