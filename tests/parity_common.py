"""Shared machinery for the golden-parity ledger and tests.

Computes every feature with the vectorized JAX bank AND the independent
per-object oracle (``tests/oracle_features.py``) over synthetic fields,
returning aligned value arrays per feature name. Used by
``tests/test_golden_parity.py`` (gate) and ``scripts/gen_parity_ledger.py``
(PARITY.md).
"""

from __future__ import annotations

import numpy as np

MAX_LABELS = 16


def _touching(labels: np.ndarray) -> bool:
    """True if any two labels are 8-adjacent (per-object oracle semantics
    then diverge from the label-map bank by construction)."""
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            a = labels[max(0, dy):labels.shape[0] + min(0, dy),
                       max(0, dx):labels.shape[1] + min(0, dx)]
            b = labels[max(0, -dy):labels.shape[0] + min(0, -dy),
                       max(0, -dx):labels.shape[1] + min(0, -dx)]
            if np.any((a > 0) & (b > 0) & (a != b)):
                return True
    return False


def make_fields(n_fields: int = 3, size: int = 128):
    """Non-touching synthetic fields (labels, img, img2)."""
    from aliby_tpu.test_data import render_cells

    fields = []
    seed = 0
    while len(fields) < n_fields and seed < 50:
        rng = np.random.default_rng(seed)
        seed += 1
        cells, nuclei, labels = render_cells(size, 7, rng)
        if _touching(labels):
            continue
        img = (cells + rng.normal(0, 0.02, cells.shape)).astype(np.float32)
        img2 = (nuclei + rng.normal(0, 0.02, cells.shape)).astype(np.float32)
        fields.append((labels.astype(np.int32), img, img2))
    return fields


def compute_pairs(fields=None) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """{feature_name: (ours, oracle)} aligned per object across fields."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aliby_tpu.extract import features as F
    from aliby_tpu.extract import texture as T

    try:
        import oracle_features as O  # pytest inserts tests/ on sys.path
    except ImportError:  # scripts/ callers
        from tests import oracle_features as O

    if fields is None:
        fields = make_fields()
    pairs: dict[str, tuple[list, list]] = {}

    def add(name, ours_arr, oracle_val, lbl):
        a, b = pairs.setdefault(name, ([], []))
        a.append(float(np.asarray(ours_arr)[lbl - 1]))
        b.append(float(oracle_val))

    for labels, img, img2 in fields:
        L = MAX_LABELS
        jl, ji, ji2 = jnp.asarray(labels), jnp.asarray(img), jnp.asarray(img2)
        ours_all = {}
        ours_all.update({k: np.asarray(v) for k, v in F.sizeshape(jl, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in F.intensity(jl, ji, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in F.pearson(jl, ji, ji2, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in F.manders_fold(jl, ji, ji2, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in F.rwc(jl, ji, ji2, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in F.costes(jl, ji, ji2, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in T.texture(jl, ji, L).items()})
        ours_all.update({k: np.asarray(v) for k, v in T.granularity(jl, ji, L).items()})
        zk = T.zernike(jl, L)
        ours_all.update({k: np.asarray(v) for k, v in zk.items()})
        rzk = T.radial_zernikes(jl, ji, L)
        ours_all.update({k: np.asarray(v) for k, v in rzk.items()})
        ours_all.update(
            {k: np.asarray(v) for k, v in T.radial_distribution(jl, ji, L).items()}
        )

        for lbl in range(1, labels.max() + 1):
            mask = labels == lbl
            oracle_all = {}
            oracle_all.update(O.o_sizeshape(mask))
            oracle_all.update(O.o_intensity(mask, img))
            oracle_all.update(O.o_pearson(mask, img, img2))
            oracle_all.update(O.o_manders_fold(mask, img, img2))
            oracle_all.update(O.o_rwc(mask, img, img2))
            oracle_all.update(O.o_costes(mask, img, img2))
            oracle_all.update(O.o_texture(mask, img))
            oracle_all.update(O.o_granularity(mask, img))
            for (n, m), v in O.o_zernike(mask).items():
                oracle_all[f"Zernike_{n}_{m}"] = v
            wsum = float(img[mask].sum())
            w = img.astype(np.float64) / max(wsum, 1e-12)
            for (n, m), v in O.o_zernike(mask, weight=w).items():
                oracle_all[f"RadialZernike_{n}_{m}"] = v
            oracle_all.update(O.o_radial_distribution(mask, img))
            for name, val in oracle_all.items():
                if name in ours_all:
                    add(name, ours_all[name], val, lbl)

    return {
        k: (np.asarray(a), np.asarray(b)) for k, (a, b) in sorted(pairs.items())
    }


def max_errors(pairs) -> dict[str, dict]:
    """Per feature: max abs err, max rel err (vs oracle scale), oracle scale."""
    out = {}
    for name, (a, b) in pairs.items():
        finite = np.isfinite(a) & np.isfinite(b)
        a, b = a[finite], b[finite]
        if not len(a):
            out[name] = {"n": 0, "abs": np.nan, "rel": np.nan, "scale": np.nan}
            continue
        abs_err = np.abs(a - b)
        scale = max(float(np.abs(b).max()), 1e-12)
        rel = abs_err / np.maximum(np.abs(b), 1e-3 * scale)
        out[name] = {
            "n": int(len(a)),
            "abs": float(abs_err.max()),
            "rel": float(rel.max()),
            "scale": scale,
        }
    return out
