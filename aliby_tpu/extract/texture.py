"""Texture / granularity / zernike / radial-distribution feature families.

TPU formulations of the remaining cp_measure core families (reference wiring
``extraction/core/functions/loaders.py:64-77``):

- texture: Haralick features from per-label gray-level co-occurrence
  matrices built by scatter-add over (label, level, level) — one pass per
  angle, all labels at once; per-object min-max quantization.
- granularity: the classic granulometry spectrum — iterative same-label
  grayscale opening (shift-based 3x3 erode/dilate), percentage of intensity
  removed per step.
- zernike: |A_nm| for n<=9 on the unit disk scaled by each object's max
  centroid distance; one (pixels x n_moments) evaluation batched into
  segment sums.
- radial_distribution: FracAtD / MeanFrac / RadialCV over 4 concentric
  rings of CellProfiler's EDT-normalized distance — center = each object's
  most-interior pixel (per-object EDT argmax), pixel distance =
  ``d_center / (d_center + d_edge + 0.001)`` — with 8 angular wedges about
  that center for the CV (see ``radial_distribution``'s docstring).

Feature names follow CellProfiler's glossary; cp_measure's exact key strings
are not verifiable in this environment (no package) and are documented as
best-effort.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from aliby_tpu.extract.reductions import (
    LabelStats,
    binned_sum_cols,
    counts,
    seg_minmax_cols,
    seg_sum,
    seg_sum_cols,
    table_lookup,
)

# ---------------------------------------------------------------------------
# Haralick texture
# ---------------------------------------------------------------------------

_NG = 256  # gray levels — matches the _256 scale suffix in the CP names
_ANGLE_OFFSETS = ((0, 1), (1, 1), (1, 0), (1, -1))  # 00, 01, 02, 03
_HARALICK_NAMES = (
    "AngularSecondMoment",
    "Contrast",
    "Correlation",
    "Variance",
    "InverseDifferenceMoment",
    "SumAverage",
    "SumVariance",
    "SumEntropy",
    "Entropy",
    "DifferenceVariance",
    "DifferenceEntropy",
    "InfoMeas1",
    "InfoMeas2",
)


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-12)) * (x > 1e-12)


def _haralick_from_glcm(P):
    """13 Haralick features from normalized symmetric GLCMs (L, G, G)."""
    G = P.shape[-1]
    i = jnp.arange(G, dtype=jnp.float32)
    ii = i[None, :, None]
    jj = i[None, None, :]
    px = P.sum(2)  # (L, G)
    py = P.sum(1)
    mu_x = (px * i).sum(1)
    mu_y = (py * i).sum(1)
    var_x = (px * (i[None] - mu_x[:, None]) ** 2).sum(1)
    var_y = (py * (i[None] - mu_y[:, None]) ** 2).sum(1)
    asm = (P**2).sum((1, 2))
    contrast = (P * (ii - jj) ** 2).sum((1, 2))
    sd = jnp.sqrt(jnp.maximum(var_x * var_y, 1e-12))
    corr = ((P * (ii - mu_x[:, None, None]) * (jj - mu_y[:, None, None])).sum((1, 2))) / sd
    corr = corr * (sd > 1e-6)
    variance = (P * (ii - mu_x[:, None, None]) ** 2).sum((1, 2))
    idm = (P / (1.0 + (ii - jj) ** 2)).sum((1, 2))
    # p_{x+y}, p_{x-y}
    k_sum = jnp.arange(2 * G - 1, dtype=jnp.float32)
    sum_idx = (ii + jj).astype(jnp.int32)[0]  # (G, G)
    p_sum = jnp.zeros((P.shape[0], 2 * G - 1))
    p_sum = p_sum.at[:, sum_idx.reshape(-1)].add(P.reshape(P.shape[0], -1))
    diff_idx = jnp.abs(ii - jj).astype(jnp.int32)[0]
    p_diff = jnp.zeros((P.shape[0], G))
    p_diff = p_diff.at[:, diff_idx.reshape(-1)].add(P.reshape(P.shape[0], -1))
    k_diff = jnp.arange(G, dtype=jnp.float32)
    sum_avg = (p_sum * k_sum).sum(1)
    sum_ent = -(p_sum * _safe_log(p_sum)).sum(1)
    sum_var = (p_sum * (k_sum[None] - sum_avg[:, None]) ** 2).sum(1)
    entropy = -(P * _safe_log(P)).sum((1, 2))
    diff_avg = (p_diff * k_diff).sum(1)
    diff_var = (p_diff * (k_diff[None] - diff_avg[:, None]) ** 2).sum(1)
    diff_ent = -(p_diff * _safe_log(p_diff)).sum(1)
    hx = -(px * _safe_log(px)).sum(1)
    hy = -(py * _safe_log(py)).sum(1)
    pxy = px[:, :, None] * py[:, None, :]
    hxy1 = -(P * _safe_log(pxy)).sum((1, 2))
    hxy2 = -(pxy * _safe_log(pxy)).sum((1, 2))
    denom = jnp.maximum(jnp.maximum(hx, hy), 1e-12)
    im1 = (entropy - hxy1) / denom
    im2 = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-2.0 * (hxy2 - entropy)), 0.0))
    return dict(
        zip(
            _HARALICK_NAMES,
            (
                asm, contrast, corr, variance, idm, sum_avg, sum_var,
                sum_ent, entropy, diff_var, diff_ent, im1, im2,
            ),
        )
    )


def _run_lengths(sk, nbig):
    """Per-element run length of a SORTED int32 key array (exact, int32):
    run starts by neighbor-compare, start positions by running max, run ends
    by reverse running min of the next start position."""
    n = sk.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    rs = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    start = jax.lax.cummax(jnp.where(rs, iota, -1))
    nxt = jnp.concatenate([jnp.where(rs, iota, nbig)[1:], jnp.full(1, n, jnp.int32)])
    end = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
    return end - start, rs




@functools.partial(jax.jit, static_argnames=("max_labels", "scale"))
def texture(labels: jnp.ndarray, img: jnp.ndarray, max_labels: int, scale: int = 3) -> dict:
    """13 Haralick features x 4 angles from per-object 256-level GLCMs.

    SORT-based sparse formulation. A dense symmetric (L, 256, 256) GLCM
    holds <= HW nonzero cells, and on TPU random-access scatter updates run
    ~100 M/s while sort runs ~500 M el/s and cumsum is bandwidth-free — so
    every histogram-shaped term is computed by sorting compact integer keys
    and run-length encoding instead of scattering:

    - linear-in-P terms (contrast, IDM, sum/diff moments, E[ij], marginal
      mean/variance — all symmetric in (i, j)) are pure functions of the
      (qmin, qmax) the sorted joint key encodes, so they ride the same
      cumsum/boundary group sums as the entropy terms — no separate
      binned pass at all; N = all 4 angles' pair slots;
    - ASM and entropy need each pair's own symmetric cell count s: sort
      key = (angle, label, q0+q1, |q0-q1|) — a bijection of the cell
      (qmin, qmax); run length r gives s = r (off-diag, two cells each of
      count r) or 2r (diagonal, one cell of count 2r); then
      sum_cells s^2 = sum_el 2 s_el and
      -sum_cells (s/T) log(s/T) = [-2 sum_el log s_el] / T + log T. The
      sum-major order makes (angle, label, q0+q1) slices contiguous, so
      the SUM-marginal entropy is a second run-length pass on the same
      sorted array (diff digit stripped) — no separate sort;
    - the remaining marginal entropies (hx over endpoints — the symmetric
      GLCM has px == py so hxy1 == hxy2 == 2*hx — and diff entropy over
      |q0-q1|) sort their own value-tagged keys and ride the same
      cumsum/boundary group sums.
    Per-(angle,label) totals are one scatter-add into (angle, label) bins
    (group id = the sorted key's high bits). An earlier segmented-cumsum +
    boundary-read formulation computed the same sums gather-free, but its
    ``associative_scan`` cost ~60 s of XLA compile PER INSTANCE (the fused
    full-bank program holds several) — the scatter compiles in seconds and
    the runtime difference is noise next to the sorts.
    """
    img = img.astype(jnp.float32)
    present = counts(labels, max_labels) > 0
    G = _NG
    # per-object min-max quantization to G levels: one (min,max) kernel
    # pass + one 2-column table lookup (vs 2 scatters + 2 gathers)
    fg = labels > 0
    mn, mx = seg_minmax_cols(img[..., None], labels, max_labels)
    vmin = jnp.nan_to_num(mn[:, 0], posinf=0.0)
    vmax = jnp.nan_to_num(mx[:, 0], neginf=0.0)
    span = jnp.maximum(vmax - vmin, 1e-12)
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    lk = table_lookup(jnp.stack([vmin, span], axis=-1), l_idx)
    q = jnp.clip(
        ((img - lk[..., 0]) / lk[..., 1] * G).astype(jnp.int32), 0, G - 1
    )
    H, W = labels.shape
    out = {}
    A = len(_ANGLE_OFFSETS)
    L1 = max_labels + 1
    # all 4 angles' pair slots, angle-tagged; invalid slots carry label 0 and
    # land in each angle's label-0 bins, which every [:, 1:] slice drops.
    lbls, q0s, q1s = [], [], []
    n_pair_slots = []
    for dy, dx in _ANGLE_OFFSETS:
        oy, ox = dy * scale, dx * scale
        ys = slice(max(0, -oy), H - max(0, oy))
        xs = slice(max(0, -ox), W - max(0, ox))
        ys2 = slice(max(0, oy), H - max(0, -oy))
        xs2 = slice(max(0, ox), W - max(0, -ox))
        l0 = labels[ys, xs].reshape(-1)
        l1 = labels[ys2, xs2].reshape(-1)
        valid = (l0 > 0) & (l0 == l1)
        lbls.append(jnp.where(valid, l0, 0))
        q0s.append(q[ys, xs].reshape(-1))
        q1s.append(q[ys2, xs2].reshape(-1))
        n_pair_slots.append(l0.shape[0])
    lbl = jnp.concatenate(lbls)
    q0i = jnp.concatenate(q0s)
    q1i = jnp.concatenate(q1s)
    ang = jnp.concatenate(
        [jnp.full((n,), a, jnp.int32) for a, n in enumerate(n_pair_slots)]
    )
    N = lbl.shape[0]
    LA = A * L1
    al = ang * L1 + lbl  # (angle, label) flat group id

    # ---- joint sort: every linear statistic + ASM + entropy --------------
    # SUM-MAJOR cell key: (angle, label, q0+q1, |q0-q1|). The (sum, diff)
    # pair is a bijection of the symmetric cell (qmin, qmax) — runs are
    # the same GLCM cells in a different order — but this ordering makes
    # each (angle, label, sum) slice contiguous, so the SUM-marginal
    # entropy rides this sort too (a second run-length pass on the key
    # with the diff digit stripped) instead of paying its own N-element
    # sort.
    sm = q0i + q1i
    df = jnp.abs(q0i - q1i)
    G2 = 2 * G
    jkey = (al * G2 + sm) * G + df
    sjk = jnp.sort(jkey)
    rlen, _ = _run_lengths(sjk, jnp.int32(N + G2 * G * LA))
    s_sum = ((sjk // G) % G2).astype(jnp.float32)  # q0+q1 per element
    s_df = (sjk % G).astype(jnp.float32)  # |q0-q1| per element
    s_cell = jnp.where(s_df == 0, 2 * rlen, rlen).astype(jnp.float32)
    # run lengths of the (angle, label, sum) regions: m(al, sigma) counts
    # for the sum-marginal entropy, per element
    rlen_sum, _ = _run_lengths(sjk // G, jnp.int32(N + G2 * LA))
    # per-(angle, label) group totals over a SORTED key array: the keys are
    # gid*SPAN + value, so group g occupies the contiguous slice
    # [searchsorted(g*SPAN), searchsorted((g+1)*SPAN)) — one f32 cumsum
    # (XLA tree scan, ~0.3 ms at 16x1M) read at LA+1 boundary positions
    # (~5 ms) replaces a 1-col one-hot kernel pass (~31 ms at 16x4N).
    # Label-0 (invalid-pair) contributions are zeroed BEFORE the cumsum so
    # the running magnitude — and therefore the f32 cancellation error of
    # late boundary differences — tracks the valid pairs only.
    def _group_sums(sorted_keys, vals, span):
        vals = jnp.where(
            ((sorted_keys // span) % L1 == 0)[:, None], 0.0, vals
        )
        cs = jnp.concatenate(
            [jnp.zeros((1, vals.shape[1])), jnp.cumsum(vals, axis=0)]
        )
        pos = jnp.searchsorted(
            sorted_keys, jnp.arange(LA + 1, dtype=jnp.int32) * span
        )
        return (cs[pos[1:]] - cs[pos[:-1]]).reshape(A, L1, -1)[:, 1:]

    # Every symmetric linear statistic is a function of the (sum, diff)
    # pair the sorted key itself encodes — so the 8 columns the old
    # standalone one-hot binned pass accumulated (~35 ms/16 images) ride
    # the SAME cumsum/boundary read as the entropy terms, for the cost of
    # extra cumsum columns (~3 ms). Validity needs no explicit mask:
    # invalid slots carry label 0 and _group_sums zeroes them before the
    # cumsum.
    jvals = jnp.stack(
        [
            jnp.ones_like(s_df),    # pair count n
            s_df * s_df,            # contrast
            1.0 / (1.0 + s_df * s_df),  # inverse difference moment
            s_sum,                  # sum average numerator
            s_sum * s_sum,          # sum 2nd moment
            s_df,                   # diff average numerator
            (s_sum * s_sum - s_df * s_df) / 4.0,  # E[ij] (qmin*qmax)
            (s_sum * s_sum + s_df * s_df) / 2.0,  # endpoint 2nd moment
            2.0 * s_cell,           # ASM numerator
            -2.0 * jnp.log(s_cell),  # joint entropy numerator
            -jnp.log(rlen_sum.astype(jnp.float32)),  # sum-marginal entropy
        ],
        axis=-1,
    )
    acc = _group_sums(sjk, jvals, G2 * G)  # (A, L, 11)
    n_pairs = acc[..., 0]
    T = jnp.maximum(2.0 * n_pairs, 1e-12)
    logT = jnp.log(T)
    asm = acc[..., 8] / T**2
    entropy = acc[..., 9] / T + logT
    ment_sums = acc[..., 10]

    # ---- remaining marginal entropies: hx, diff entropy -------------------
    # -sum_v m log m == -sum_el log(run_len of el's value) over a sort of
    # value-tagged keys (each element of an m-run contributes -log m).
    # The two remaining marginals sort SEPARATELY (2N + N; separate sorts
    # beat a concatenated layout, and peak sort workspace halves); group
    # totals ride the cumsum/boundary read above; the SUM marginal rides
    # the joint sort (sum-major key). (Ancient history: dense tables
    # scattered at ~45 ms EACH; one-hot kernel on 4N cost ~31 ms.)
    def _ment(keys, span):
        sk = jnp.sort(keys)
        rl, _ = _run_lengths(sk, jnp.int32(keys.shape[0]))
        contrib = -jnp.log(rl.astype(jnp.float32))[:, None]
        return _group_sums(sk, contrib, span)[..., 0]

    ment_ends = _ment(jnp.concatenate([al * G + q0i, al * G + q1i]), G)
    ment_diffs = _ment(al * G + jnp.abs(q0i - q1i), G)
    inv_n = 1.0 / jnp.maximum(n_pairs, 1e-12)
    logn = jnp.log(jnp.maximum(n_pairs, 1e-12))
    hx = ment_ends / T + logT
    sum_ent = ment_sums * inv_n + logn
    diff_ent = ment_diffs * inv_n + logn

    # ---- assemble the 13 features ----------------------------------------
    contrast = acc[..., 1] * inv_n
    idm = acc[..., 2] * inv_n
    sum_avg = acc[..., 3] * inv_n
    sum_var = jnp.maximum(acc[..., 4] * inv_n - sum_avg**2, 0.0)
    diff_avg = acc[..., 5] * inv_n
    diff_var = jnp.maximum(contrast - diff_avg**2, 0.0)
    e_ij = acc[..., 6] * inv_n
    mu = sum_avg / 2.0
    # marginal variance over both endpoints: E[v^2] - mu^2 with the
    # endpoint 2nd moment from the same scatter (T = 2n endpoints)
    var = jnp.maximum(acc[..., 7] / T - mu**2, 0.0)
    corr = ((e_ij - mu**2) / jnp.maximum(var, 1e-12)) * (var > 1e-6)
    # separable joint-entropy bounds: hxy1 == hxy2 == hx + hy == 2*hx
    im1 = (entropy - 2.0 * hx) / jnp.maximum(hx, 1e-12)
    im2 = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-2.0 * (2.0 * hx - entropy)), 0.0))
    feats = dict(
        zip(
            _HARALICK_NAMES,
            (
                asm, contrast, corr, var, idm, sum_avg, sum_var,
                sum_ent, entropy, diff_var, diff_ent, im1, im2,
            ),
        )
    )
    has_pairs = n_pairs > 0
    for a_idx in range(A):
        for name, v in feats.items():
            out[f"Texture_{name}_{scale}_{a_idx:02d}_256"] = jnp.where(
                present & has_pairs[a_idx], v[a_idx], jnp.nan
            )
    return out


# ---------------------------------------------------------------------------
# Granularity
# ---------------------------------------------------------------------------


_OFFS4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _same_label_morph_ops(labels):
    """Build (erode, dilate) closures with the same-label neighbor masks
    precomputed ONCE — labels never change across the ~150 morphology passes
    of a granularity spectrum, so re-padding/comparing them per pass wasted
    ~half the op count."""
    H, W = labels.shape
    l_pad = jnp.pad(labels, 1, constant_values=-1)
    same = {
        (dy, dx): l_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx] == labels
        for dy, dx in _OFFS4
    }

    def erode(img):
        a_pad = jnp.pad(img, 1, constant_values=jnp.inf)
        out = img
        for (dy, dx), m in same.items():
            nb = a_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
            out = jnp.minimum(out, jnp.where(m, nb, jnp.inf))
        return out

    def dilate(img):
        a_pad = jnp.pad(img, 1, constant_values=-jnp.inf)
        out = img
        for (dy, dx), m in same.items():
            nb = a_pad[1 + dy : H + 1 + dy, 1 + dx : W + 1 + dx]
            out = jnp.maximum(out, jnp.where(m, nb, -jnp.inf))
        return out

    return erode, dilate


@functools.partial(jax.jit, static_argnames=("max_labels", "n_steps"))
def granularity(labels: jnp.ndarray, img: jnp.ndarray, max_labels: int, n_steps: int = 16) -> dict:
    """Granularity spectrum: % intensity removed by opening of size k."""
    img = img.astype(jnp.float32)
    fg = labels > 0
    present = counts(labels, max_labels) > 0
    masked = jnp.where(fg, img, 0.0)
    erode, dilate = _same_label_morph_ops(labels)

    eroded = masked
    opened_cols = [masked]
    for k in range(1, n_steps + 1):
        eroded = erode(eroded)
        opened = eroded
        for _ in range(k):
            opened = dilate(opened)
        opened_cols.append(jnp.where(fg, opened, 0.0))
    # all n_steps+1 per-label sums in ONE one-hot MXU pass
    sums = seg_sum_cols(jnp.stack(opened_cols, axis=-1), labels, max_labels)
    start = sums[:, 0]
    safe_start = jnp.maximum(start, 1e-12)
    out = {}
    prev = start
    for k in range(1, n_steps + 1):
        g = 100.0 * (prev - sums[:, k]) / safe_start
        out[f"Granularity_{k}"] = jnp.where(present, g, jnp.nan)
        prev = sums[:, k]
    return out


# ---------------------------------------------------------------------------
# Zernike moments
# ---------------------------------------------------------------------------


def _zernike_pairs(max_n: int = 9):
    pairs = []
    for n in range(max_n + 1):
        for m in range(n % 2, n + 1, 2):
            pairs.append((n, m))
    return pairs


def zernike_family_multi(labels, imgs, with_mask: bool, max_labels: int):
    """All zernike-family entries of a tree in ONE geometry pass + ONE
    segment reduction.

    |A_nm| over each object's minimum-enclosing-circle unit disk (the
    centrosome/CellProfiler zernike convention: the disk is the object's
    minimum enclosing circle, not a centroid-centered one). A full default
    tree carries 1 mask-weighted entry (``zernike``) plus one
    intensity-weighted entry per channel (``radial_zernikes``); evaluated
    independently each rebuilds the MEC geometry, rho/theta, the 30 radial
    polynomials and 60 trig rasters, and pays its own 60-column segment
    pass. Here the weight factors out of the integrand: the 60 polynomial
    rasters ``R_nm*cos/sin`` are built once and every entry contributes
    ``w_c * Z`` columns to ONE (HW, C*60 + C) one-hot-MXU reduction (the
    +C are per-entry non-finite indicator columns that reproduce the
    per-entry scatter NaN-poisoning semantics the kernel's shared flag
    would otherwise widen across entries).

    ``imgs``: (C', H, W) intensity rasters for the radial entries (C' may
    be 0 → shape (0, H, W)); ``with_mask``: whether to also emit the
    unweighted entry. Returns ``(mask_dict_or_None, [dict per img])`` with
    {(n, m): (L,)} values.
    """
    from aliby_tpu.extract.reductions import minimum_enclosing_circle

    st = LabelStats(labels, max_labels)
    present = st.present
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    mcy, mcx, mr = minimum_enclosing_circle(labels, max_labels)
    rmax = jnp.maximum(jnp.where(jnp.isfinite(mr), mr, 1.0), 1.0)
    lk = table_lookup(jnp.stack([mcy, mcx, rmax], axis=-1), l_idx)
    dy = st.yy - lk[..., 0]
    dx = st.xx - lk[..., 1]
    r = jnp.sqrt(dy**2 + dx**2)
    rho = r / lk[..., 2]
    theta = jnp.arctan2(dy, dx)
    inside = (labels > 0) & (rho <= 1.0 + 1e-6)
    base = inside.astype(jnp.float32)

    # per-entry weight rasters ---------------------------------------------
    ws = []
    if with_mask:
        ws.append(base)
    nC = int(imgs.shape[0])
    if nC:
        imf = imgs.astype(jnp.float32)
        fg = labels > 0
        # per-object intensity totals for ALL channels in one pass
        # (normalizes magnitudes to be scale-free, matching upstream)
        masked = jnp.where(fg[None], jnp.nan_to_num(imf), 0.0)
        tots = seg_sum_cols(
            jnp.moveaxis(masked, 0, -1), labels, max_labels
        )  # (L, C')
        inv = table_lookup(1.0 / jnp.maximum(tots, 1e-12), l_idx)  # (H,W,C')
        for c in range(nC):
            ws.append(jnp.where(inside, imf[c] * inv[..., c], 0.0))

    pairs = _zernike_pairs()
    max_n = max(n for n, _ in pairs)
    pows = [jnp.ones_like(rho)]
    for _ in range(max_n):
        pows.append(pows[-1] * rho)
    zcols = []
    for n, m in pairs:
        R = jnp.zeros_like(rho)
        for s in range((n - m) // 2 + 1):
            c = (
                (-1) ** s
                * math.factorial(n - s)
                / (
                    math.factorial(s)
                    * math.factorial((n + m) // 2 - s)
                    * math.factorial((n - m) // 2 - s)
                )
            )
            R = R + c * pows[n - 2 * s]
        zcols.append(R * jnp.cos(m * theta))
        zcols.append(R * jnp.sin(m * theta))
    Z = jnp.stack(zcols, axis=-1)  # (H, W, 60), weight-independent
    K = Z.shape[-1]

    blocks = []
    for w in ws:
        finite = jnp.isfinite(w)
        wc = jnp.where(finite, w, 0.0)
        blocks.append(Z * wc[..., None])
        blocks.append((~finite).astype(jnp.float32)[..., None])
    vals = jnp.concatenate(blocks, axis=-1)  # (H, W, C*(K+1))
    acc = seg_sum_cols(vals, labels, max_labels)  # (L, C*(K+1)), one pass

    def unpack(e):
        a = acc[:, e * (K + 1) : e * (K + 1) + K]
        poison = acc[:, e * (K + 1) + K] > 0
        out = {}
        for i, (n, m) in enumerate(pairs):
            re, im = a[:, 2 * i], a[:, 2 * i + 1]
            norm = (n + 1) / (jnp.pi * rmax**2)
            mag = jnp.sqrt(re**2 + im**2) * norm
            out[(n, m)] = jnp.where(present & ~poison, mag, jnp.nan)
        return out

    e = 0
    mask_out = None
    if with_mask:
        mask_out = unpack(0)
        e = 1
    img_outs = [unpack(e + c) for c in range(nC)]
    return mask_out, img_outs


@functools.partial(jax.jit, static_argnames=("max_labels",))
def zernike(labels: jnp.ndarray, max_labels: int) -> dict:
    empty = jnp.zeros((0,) + labels.shape, jnp.float32)
    vals, _ = zernike_family_multi(labels, empty, True, max_labels)
    return {f"Zernike_{n}_{m}": v for (n, m), v in vals.items()}


@functools.partial(jax.jit, static_argnames=("max_labels",))
def radial_zernikes(labels: jnp.ndarray, img: jnp.ndarray, max_labels: int) -> dict:
    """Intensity-weighted zernike magnitudes (cp_measure radial_zernikes)."""
    _, outs = zernike_family_multi(labels, img[None], False, max_labels)
    return {f"RadialZernike_{n}_{m}": v for (n, m), v in outs[0].items()}


# ---------------------------------------------------------------------------
# Radial distribution
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_labels", "n_bins", "n_wedges"))
def radial_distribution(
    labels: jnp.ndarray,
    img: jnp.ndarray,
    max_labels: int,
    n_bins: int = 4,
    n_wedges: int = 8,
) -> dict:
    """FracAtD / MeanFrac / RadialCV with CellProfiler's EDT-normalized
    binning (MeasureObjectIntensityDistribution): the object center is the
    most-interior pixel (argmax of the per-object EDT, first in raster
    order on ties), and each pixel's normalized distance is
    ``d_center / (d_center + d_edge + 0.001)`` — 0 at the center, ->1 at
    the boundary regardless of shape. Wedges for RadialCV are the 8
    angular sectors about that same center."""
    img = img.astype(jnp.float32)
    st = LabelStats(labels, max_labels)
    present = st.present
    l_idx = jnp.clip(labels - 1, 0, max_labels - 1)
    from aliby_tpu.ops.edt import edt_to_other_label

    H, W = labels.shape
    d_edge = jnp.where(labels > 0, edt_to_other_label(labels), 0.0)
    # center = argmax of d_edge per label, ties -> first raster position.
    # The JFA EDT is sqrt of an integer, so the argmax rides ONE packed
    # int32 scatter-min of ((CAP - d^2) << 16 | pos) — max d, tie -> min
    # pos — instead of a scatter-max + gather + scatter-min chain.
    flat_l = jnp.clip(labels, 0, max_labels).reshape(-1)
    fgf = (labels > 0).reshape(-1)
    pos = jnp.arange(H * W, dtype=jnp.int32)
    i32max = jnp.iinfo(jnp.int32).max
    if H * W <= (1 << 16):
        d2i = jnp.minimum(
            jnp.round(d_edge * d_edge).astype(jnp.int32), (1 << 15) - 2
        ).reshape(-1)
        key = ((((1 << 15) - 2) - d2i) << 16) | pos
        best = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(fgf, flat_l, 0)
        ].min(jnp.where(fgf, key, i32max))[1:]
        first = best & 0xFFFF
    else:
        # pos would overflow 16 bits (silently corrupting centers on any
        # image over 256x256): exact two-pass — scatter-min the negated
        # integer distance per label, then scatter-min the raster position
        # among pixels achieving it.
        d2i = jnp.round(d_edge * d_edge).astype(jnp.int32).reshape(-1)
        neg_best = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(fgf, flat_l, 0)
        ].min(jnp.where(fgf, -d2i, i32max))
        at_best = fgf & (d2i == -neg_best[flat_l])
        first = jnp.full(max_labels + 1, i32max, jnp.int32).at[
            jnp.where(at_best, flat_l, 0)
        ].min(jnp.where(at_best, pos, i32max))[1:]
        first = jnp.where(first == i32max, 0, first)
    ccy = jnp.floor(first.astype(jnp.float32) / W)
    ccx = first.astype(jnp.float32) - ccy * W
    cc = table_lookup(jnp.stack([ccy, ccx], axis=-1), l_idx)
    dy = st.yy - cc[..., 0]
    dx = st.xx - cc[..., 1]
    r = jnp.sqrt(dy**2 + dx**2)
    nd = r / (r + d_edge + 0.001)
    ring = jnp.clip((nd * n_bins).astype(jnp.int32), 0, n_bins - 1)
    theta = jnp.arctan2(dy, dx)  # -pi..pi
    wedge = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * n_wedges).astype(jnp.int32), 0, n_wedges - 1
    )
    fg = labels > 0
    total_i = jnp.maximum(seg_sum(jnp.where(fg, img, 0.0), labels, max_labels), 1e-12)
    total_n = jnp.maximum(st.area, 1.0)
    out = {}
    # one 10-column binned pass over (label, ring) bins: intensity sum,
    # pixel count, and the 8 wedge-partitioned intensity sums (wedge
    # membership as one-hot columns) — replaces three scatters, one of
    # them into an 8224-bin space
    flat_lr = jnp.where(fg, labels, 0) * n_bins + ring
    img_m = jnp.where(fg, img, 0.0)
    wedge_oh = (
        wedge[..., None] == jnp.arange(n_wedges, dtype=jnp.int32)
    ).astype(jnp.float32)
    cols = jnp.concatenate(
        [
            img_m[..., None],
            fg.astype(jnp.float32)[..., None],
            img_m[..., None] * wedge_oh,
        ],
        axis=-1,
    )  # (H, W, 2 + n_wedges)
    acc = binned_sum_cols(cols, flat_lr, (max_labels + 1) * n_bins).reshape(
        max_labels + 1, n_bins, 2 + n_wedges
    )[1:]
    ring_i = acc[..., 0]
    ring_n = acc[..., 1]
    rw_i = acc[..., 2:]
    for b in range(n_bins):
        frac_at_d = ring_i[:, b] / total_i
        frac_px = ring_n[:, b] / total_n
        mean_frac = frac_at_d / jnp.maximum(frac_px, 1e-12)
        wvals = rw_i[:, b, :]
        wmean = wvals.mean(1)
        wstd = jnp.sqrt(jnp.maximum((wvals**2).mean(1) - wmean**2, 0.0))
        cv = wstd / jnp.maximum(wmean, 1e-12)
        tag = f"{b + 1}of{n_bins}"
        out[f"RadialDistribution_FracAtD_{tag}"] = jnp.where(present, frac_at_d, jnp.nan)
        out[f"RadialDistribution_MeanFrac_{tag}"] = jnp.where(present, mean_frac, jnp.nan)
        out[f"RadialDistribution_RadialCV_{tag}"] = jnp.where(present, cv, jnp.nan)
    return out
