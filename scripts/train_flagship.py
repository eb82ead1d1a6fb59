"""Train the flagship CellposeNet on synthetic fields and bundle weights.

Run on the TPU chip:  python scripts/train_flagship.py [n_steps] [--budding F]
Writes aliby_tpu/models/weights/cellpose_synthetic.msgpack (f16 msgpack).

``--budding 0.4`` mixes 40% budding-yeast frames (attached mother+bud
pairs) into the batches so the model learns bud-neck separation — the
BABY-class geometry. Restart note (memory): a fresh cosine schedule at
lr 2e-3 on warm weights spikes the loss; use a lower peak when resuming.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_steps = int(args[0]) if args else 400
    budding = (
        float(sys.argv[sys.argv.index("--budding") + 1])
        if "--budding" in sys.argv
        else 0.0
    )
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
    resumed = BUNDLED_WEIGHTS.exists() and "--fresh" not in sys.argv
    peak_lr = 5e-4 if resumed else 2e-3  # lower restart lr on warm weights
    tx = optax.adamw(optax.cosine_decay_schedule(peak_lr, n_steps, 0.05))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    t0 = time.time()
    for i in range(n_steps):
        batch = synthetic_batch(rng, batch=8, size=128, budding_frac=budding)
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
