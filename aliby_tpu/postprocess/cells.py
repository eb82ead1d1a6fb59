"""Cells: post-hoc mask/label queries over per-tp npz checkpoints.

The Parquet/npz-era successor of the reference's h5 ``Cells``
(``agora/io/cells.py:16-437``): masks and labels at a timepoint, per-tile
label inventories, presence matrices, and mother-daughter matrices from
the tracking parquet.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow.parquet as pq


class Cells:
    def __init__(self, output_path: str | Path, position: str, step: str = "segment_cell"):
        self.output_path = Path(output_path)
        self.position = position
        self.step = step
        self.step_dir = self.output_path / "steps" / position / step

    @property
    def ntimepoints(self) -> int:
        return len(sorted(self.step_dir.glob("*.npz")))

    def _load(self, tp: int) -> list[np.ndarray]:
        f = self.step_dir / f"{tp:04d}.npz"
        with np.load(f) as npz:
            keys = sorted(npz.keys())
            if "tile_0" in keys:
                return [npz[k] for k in sorted(
                    (k for k in keys if k.startswith("tile_")),
                    key=lambda s: int(s.split("_")[1]),
                )]
            return list(npz["arr_0"])

    def masks_at_time(self, tp: int) -> list[np.ndarray]:
        """Per-tile 2-D label maps (layered BABY masks are max-projected —
        safe: layers never overlap per pixel)."""
        out = []
        for m in self._load(tp):
            m = np.asarray(m)
            out.append(m.max(axis=0) if m.ndim == 3 else m)
        return out

    def labels_at_time(self, tp: int) -> dict[int, list[int]]:
        return {
            tile_i: [int(l) for l in np.unique(m) if l]
            for tile_i, m in enumerate(self.masks_at_time(tp))
        }

    @property
    def labels(self) -> list[list[int]]:
        """Per-tile union of labels across all timepoints."""
        per_tile: dict[int, set] = {}
        for tp in range(self.ntimepoints):
            for tile_i, labels in self.labels_at_time(tp).items():
                per_tile.setdefault(tile_i, set()).update(labels)
        return [sorted(per_tile[k]) for k in sorted(per_tile)]

    def presence_matrix(self, tile: int = 0) -> np.ndarray:
        """(n_labels, T) bool presence of each label per timepoint."""
        ntps = self.ntimepoints
        all_labels = self.labels[tile] if self.labels else []
        out = np.zeros((len(all_labels), ntps), bool)
        lut = {l: i for i, l in enumerate(all_labels)}
        for tp in range(ntps):
            for l in self.labels_at_time(tp).get(tile, []):
                out[lut[l], tp] = True
        return out

    def outlines_at_time(self, tp: int) -> list[np.ndarray]:
        """Per-tile boolean outlines (label boundaries)."""
        import jax

        from aliby_tpu.extract.reductions import boundary_mask

        return [
            np.asarray(boundary_mask(np.asarray(m, np.int32)))
            for m in self.masks_at_time(tp)
        ]

    # -- lineage ------------------------------------------------------------

    def _tracking(self):
        f = self.output_path / "tracking" / f"{self.position}_{self.step}.parquet"
        return pq.read_table(f).to_pandas() if f.exists() else None

    def mothers_daughters(self) -> np.ndarray:
        """(M, 2, 2) of ((tile, mother_label), (tile, daughter_label))."""
        track = self._tracking()
        if track is None:
            return np.zeros((0, 2, 2), int)
        pairs = (
            track[track["mother_label"] > 0][
                ["tile", "mother_label", "cell_label"]
            ]
            .drop_duplicates()
            .to_numpy()
        )
        if not len(pairs):
            return np.zeros((0, 2, 2), int)
        return np.stack([pairs[:, [0, 1]], pairs[:, [0, 2]]], axis=1)

    def mothers_daughters_matrix(self, tile: int = 0) -> np.ndarray:
        """(n_labels, n_labels) bool adjacency: mother row -> daughter col."""
        labels = self.labels[tile] if self.labels else []
        lut = {l: i for i, l in enumerate(labels)}
        out = np.zeros((len(labels), len(labels)), bool)
        for (t0, mother), (t1, daughter) in self.mothers_daughters():
            if t0 == tile and mother in lut and daughter in lut:
                out[lut[mother], lut[daughter]] = True
        return out
