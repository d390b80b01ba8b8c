"""Generate tests/fixtures/teacher_synth_golden.npz — the `original`-family
golden regression fixture (see tests/test_teacher_chain.py).

Run from the repo root on the CPU platform:
    python tools/gen_teacher_golden.py
"""

import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from collaborative_distillation_tpu.cli.make_teacher import (  # noqa: E402
    build_synthetic_teacher,
    synth_calibration_batches,
)
from collaborative_distillation_tpu.models.specs import decoder_spec, encoder_spec  # noqa: E402
from collaborative_distillation_tpu.models.vgg import apply_decoder, apply_encoder  # noqa: E402
from collaborative_distillation_tpu.models.zoo import load_stage_params  # noqa: E402

SEED, STAGE = 0, 2
out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures", "teacher_synth_golden.npz")

x = jnp.asarray(np.random.default_rng(123).random((1, 48, 64, 3), np.float32))
with tempfile.TemporaryDirectory() as td:
    build_synthetic_teacher(td, stages=(STAGE,), seed=SEED,
                            calib_batches=synth_calibration_batches(8, 4, 64, SEED))
    espec = encoder_spec("original", STAGE)
    dspec = decoder_spec("original", STAGE)
    enc = load_stage_params(os.path.join(td, "original", f"e{STAGE}.npz"), espec)
    dec = load_stage_params(os.path.join(td, "original", f"d{STAGE}.npz"), dspec)
feats = apply_encoder(enc, x, espec)["out"]
recon = apply_decoder(dec, feats, dspec)["out"]
os.makedirs(os.path.dirname(out_path), exist_ok=True)
np.savez(out_path, seed=SEED, stage=STAGE, input=np.asarray(x),
         enc_out=np.asarray(feats), dec_out=np.asarray(recon))
print(f"wrote {out_path}: enc_out {feats.shape} mean {float(jnp.mean(feats)):.4f}, "
      f"dec_out {recon.shape}")
