"""Golden parity gate: JAX feature bank vs the independent scipy oracle.

Enforces the north-star 1e-3 relative-error bound (BASELINE.md) feature by
feature, with explicit documented waivers where float32 or discretization
makes 1e-3 unattainable. ``scripts/gen_parity_ledger.py`` writes the full
measured ledger to PARITY.md from the same machinery.
"""

import fnmatch

import numpy as np
import pytest

from parity_common import compute_pairs, max_errors

# feature-name pattern -> (kind, bound, reason)
#   rel: max relative error vs oracle (denominator clamped at 1e-3*scale)
#   abs: absolute bound (identically-zero-by-definition features)
WAIVERS = {
    # first central/normalized moments are 0 by definition on both sides;
    # relative error is meaningless — gate absolutely vs coordinate scale.
    "AreaShape_CentralMoment_0_1": ("abs", 2e-2, "identically zero"),
    "AreaShape_CentralMoment_1_0": ("abs", 2e-2, "identically zero"),
    "AreaShape_NormalizedMoment_0_1": ("abs", 1e-4, "identically zero"),
    "AreaShape_NormalizedMoment_1_0": ("abs", 1e-4, "identically zero"),
    "Zernike_1_1": ("abs", 1e-4, "identically ~zero (symmetric disk)"),
    "AreaShape_Zernike_1_1": ("abs", 1e-4, "identically ~zero (symmetric disk)"),
    # third-order (and mixed>=5th power) moments of near-symmetric objects
    # cancel to ~1e-4 of their natural magnitude; float32 accumulation
    # leaves ~1e-2 relative error exactly where the value is near zero.
    "AreaShape_CentralMoment_0_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_3_0": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_2_1": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_1_2": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_2_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_3_2": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_CentralMoment_3_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_0_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_3_0": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_2_1": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_1_2": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_2_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_3_2": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_NormalizedMoment_3_3": ("rel", 2.5e-2, "float32 cancellation"),
    "AreaShape_HuMoment_3": ("rel", 2.5e-2, "third-order composition"),
    "AreaShape_HuMoment_4": ("rel", 2.5e-2, "third-order composition"),
    "AreaShape_HuMoment_5": ("rel", 2.5e-2, "third-order composition"),
    "AreaShape_HuMoment_6": ("rel", 2.5e-2, "third-order composition"),
    "Granularity_*": ("rel", 5e-3, "iterated morphology float accumulation"),
    "Intensity_MassDisplacement": ("rel", 5e-3, "small-denominator metric"),
    "AreaShape_MinFeretDiameter": ("rel", 2e-3, "360-direction calipers"),
}

DEFAULT_REL = 1e-3


def _bound_for(name):
    for pat, spec in WAIVERS.items():
        if fnmatch.fnmatch(name, pat):
            return spec
    return ("rel", DEFAULT_REL, "")


@pytest.fixture(scope="module")
def parity():
    pairs = compute_pairs()
    return pairs, max_errors(pairs)


def test_coverage(parity):
    pairs, _ = parity
    # every family is represented in the comparison set
    prefixes = {n.split("_")[0] for n in pairs} | {n for n in pairs}
    for family in (
        "AreaShape", "Intensity", "Location", "Texture", "Granularity",
        "Zernike", "RadialZernike", "RadialDistribution", "pearson",
        "manders_fold", "rwc", "slope", "costes",
    ):
        assert family in prefixes, f"family {family} missing from parity set"
    assert len(pairs) > 200


def test_every_feature_within_tolerance(parity):
    pairs, errs = parity
    failures = []
    for name, e in errs.items():
        if e["n"] == 0:
            failures.append((name, "no finite samples"))
            continue
        kind, bound, _why = _bound_for(name)
        val = e["abs"] if kind == "abs" else e["rel"]
        if not np.isfinite(val) or val > bound:
            failures.append((name, f"{kind} err {val:.3e} > {bound:.1e}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_costes_threshold_sane():
    """Range sanity on the linear_costes emulation (the numerical gate vs
    the per-pixel oracle lives in the ledger via ``o_costes``)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aliby_tpu.extract import features as F
    from parity_common import make_fields

    labels, img, img2 = make_fields(1)[0]
    out = F.costes(jnp.asarray(labels), jnp.asarray(img), jnp.asarray(img2), 16)
    for key in ("costes", "costes_2"):
        v = np.asarray(out[key])[: labels.max()]
        assert np.isfinite(v).all()
        assert ((v >= 0) & (v <= 1.0 + 1e-6)).all()
