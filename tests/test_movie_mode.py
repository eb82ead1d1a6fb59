"""Whole-movie batched execution (SURVEY §5.7 / VERDICT r2 item #6).

The movie path batches T timepoints into chunked fused dispatches and runs
stitch tracking as one lax.scan-over-T per chunk. The contract is
BIT-IDENTITY with the per-tp compiled path: same profiles, same tracker
states, same saves.
"""

from __future__ import annotations

import numpy as np
import pytest


def _yeast_pipeline(
    position, movie: bool, ntps: int = 3, chunk: int | None = None
) -> dict:
    extra = {"movie_chunk": chunk} if chunk else {}
    return {
        **extra,
        "steps": {
            "tile": {
                "tile_size": None,
                "image_kwargs": {
                    "source": {
                        "key": position["key"],
                        "path": position["path"],
                    },
                    "capture_order": "TCZYX",
                },
            },
            "segment_cell": {
                "segmenter_kwargs": {"kind": "cellpose", "min_size": 8},
                "channel_to_segment": 1,
            },
            "track": {"kind": "stitch"},
            "extract_cell": {
                "tree": {"None": {"None": ["area"]}, 1: {"max": ["mean"]}},
                "kwargs": {},
            },
        },
        "passed_data": {
            "track": [("masks", "segment_cell")],
            "extract_cell": [("masks", "segment_cell"), ("pixels", "tile")],
        },
        "passed_methods": {"segment_cell": ("tile", "get_fczyx")},
        "save": [],
        "save_interval": 1,
        "retain": {"segment_cell": 2, "tile": 1},
        "ntps": ntps,
        "compiled": True,
        "movie": movie,
    }


@pytest.mark.parametrize("chunked", [False, True])
def test_movie_identical_to_per_tp(tmp_path, data_dir, chunked):
    """chunked=True forces movie_chunk=3 at ntps=4 (the yeast_zarr fixture's
    full T), driving the cross-chunk tracker-state carry AND the last-chunk
    padding (second chunk holds 1 real tp + 2 repeated-frame pads,
    ``engine/compiled.py`` run_movie) through the FULL pipeline — VERDICT
    r3 item 5 (previously unit-tested at tracker level only)."""
    from aliby_tpu.io.dataset import DatasetZarr
    from aliby_tpu.pipe import run_pipeline_and_post
    from aliby_tpu.test_data import get_dataset_path

    root = get_dataset_path("yeast_zarr")
    position = DatasetZarr(root).get_position_ids()[0]
    ntps = 4 if chunked else 3
    chunk = 3 if chunked else None

    prof_seq, _ = run_pipeline_and_post(
        pipeline=_yeast_pipeline(position, movie=False, ntps=ntps),
        pipeline_name="seq",
        output_path=tmp_path / "seq",
        overwrite=True,
    )
    prof_mov, _ = run_pipeline_and_post(
        pipeline=_yeast_pipeline(position, movie=True, ntps=ntps, chunk=chunk),
        pipeline_name="mov",
        output_path=tmp_path / "mov",
        overwrite=True,
    )
    assert prof_seq.column_names == prof_mov.column_names
    assert prof_seq.num_rows == prof_mov.num_rows
    for name in prof_seq.column_names:
        a = prof_seq.column(name).to_pylist()
        b = prof_mov.column(name).to_pylist()
        try:
            af = np.asarray(a, float)
            bf = np.asarray(b, float)
        except (ValueError, TypeError):
            assert a == b, f"column {name} differs"
            continue
        both_nan = np.isnan(af) & np.isnan(bf)
        assert (both_nan | (af == bf)).all(), f"column {name} differs"


def test_stitch_movie_matches_sequential_rois():
    """The scan-over-T tracker (with carried chunk state) reproduces the
    per-tp stitch_rois chain exactly, including across a chunk boundary."""
    import jax.numpy as jnp

    from aliby_tpu.track.trackers import stitch_movie, stitch_rois

    rng = np.random.default_rng(7)
    T, F, H, W = 6, 2, 64, 64
    movies = np.zeros((T, F, H, W), np.int32)
    # drifting discs that occasionally disappear/appear -> fresh labels
    for f in range(F):
        for t in range(T):
            n = 3 + (t + f) % 2
            for i in range(n):
                cy = 10 + 8 * i + t  # drift down 1px/frame
                cx = 12 + 14 * i + (f * 3)
                yy, xx = np.mgrid[0:H, 0:W]
                disc = (yy - cy) ** 2 + (xx - cx) ** 2 <= 16
                movies[t, f][disc & (movies[t, f] == 0)] = i + 1

    # sequential reference: stitch_rois per tp with 2-frame windows
    state = None
    seq_states = []
    for t in range(T):
        tile_major = [
            [movies[max(0, t - 1), f], movies[t, f]]
            if t > 0
            else [movies[t, f]]
            for f in range(F)
        ]
        state = stitch_rois(tile_major, state=state)
        seq_states.append(
            {
                "labels": [np.asarray(m) for m in state["labels"]],
                "max_label": list(state["max_label"]),
            }
        )

    # movie path in two chunks (T=4 then T=2), carrying state across
    def run_chunk(tf, init):
        if init is None:
            il = np.zeros((F, H, W), np.int32)
            im = np.zeros((F,), np.int32)
            has = False
        else:
            il = np.stack(init["labels"])
            im = np.asarray(init["max_label"], np.int32)
            has = True
        g, m = stitch_movie(
            jnp.asarray(tf), jnp.asarray(il), jnp.asarray(im),
            jnp.asarray(has),
        )
        return np.asarray(g), np.asarray(m)

    g1, m1 = run_chunk(movies[:4], None)
    carry = {"labels": [g1[3, f] for f in range(F)], "max_label": m1[3]}
    g2, m2 = run_chunk(movies[4:], carry)
    g = np.concatenate([g1, g2], axis=0)
    m = np.concatenate([m1, m2], axis=0)

    for t in range(T):
        for f in range(F):
            assert (g[t, f] == seq_states[t]["labels"][f]).all(), (t, f)
            assert int(m[t, f]) == int(seq_states[t]["max_label"][f]), (t, f)
