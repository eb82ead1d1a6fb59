"""Train the flagship CellposeNet on synthetic fields and bundle weights.

Run on the TPU chip:  python scripts/train_flagship.py [n_steps]
Writes aliby_tpu/models/weights/cellpose_synthetic.msgpack (f16 msgpack).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    import jax
    import optax

    from aliby_tpu.models.segment import BUNDLED_WEIGHTS
    from aliby_tpu.models.training import (
        make_train_step,
        save_params,
        synthetic_batch,
    )
    from aliby_tpu.models.unet import init_params

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(int(time.time()) % 2**16)
    model, params = init_params(jax.random.PRNGKey(0), in_channels=2, size=128)
    if BUNDLED_WEIGHTS.exists() and "--fresh" not in sys.argv:
        from aliby_tpu.models.training import load_params

        params = load_params(BUNDLED_WEIGHTS, params)
        print("resuming from bundled weights", flush=True)
    tx = optax.adamw(optax.cosine_decay_schedule(2e-3, n_steps, 0.05))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    t0 = time.time()
    for i in range(n_steps):
        batch = synthetic_batch(rng, batch=8, size=128)
        params, opt_state, metrics = step(params, opt_state, batch)
        if (i + 1) % 25 == 0 or i == 0:
            print(
                f"step {i + 1}/{n_steps} loss={float(metrics['loss']):.4f} "
                f"flow={float(metrics['flow_loss']):.4f} "
                f"prob={float(metrics['prob_loss']):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    save_params(params, BUNDLED_WEIGHTS)
    print(f"saved {BUNDLED_WEIGHTS}", flush=True)


if __name__ == "__main__":
    main()
