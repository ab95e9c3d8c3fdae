"""TPU probe: test-time inference rate, full-size (reference parity) vs
--test-crop 364. Validates the Pallas crop_normalize path at crop == src.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
from rxtpu.train import build_model, create_train_state, make_predict_step

print("backend:", jax.default_backend())
B, G, SRC = 16, 6, 512
cfg = Config(
    data=DataConfig(path_data="x", crop_size=364, src_size=SRC),
    model=ModelConfig(backbone="resnet50", pretrained=False),
    train=TrainConfig(bs_per_device=B), experiment_id="probe",
)
model = build_model(cfg)
state, _ = create_train_state(cfg, model, steps_per_epoch=1)
rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, G, 6, SRC, SRC), dtype=np.uint8)),
    "mean": jnp.asarray(rng.uniform(0.2, 0.6, (B, 6)).astype(np.float32)),
    "std": jnp.asarray(rng.uniform(0.1, 0.4, (B, 6)).astype(np.float32)),
}

for crop in (None, 364):
    step = make_predict_step(model, crop)
    p = step(state, batch)
    assert np.isfinite(np.asarray(p, np.float32)).all()
    float(p.sum())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            p = step(state, batch)
        float(p.sum())
        ts.append(time.perf_counter() - t0)
    per = min(ts[1:]) / 10 * 1e3
    print(f"predict crop={crop}: {per:.2f} ms/batch "
          f"({B * G / per * 1e3:.0f} views/s)")
