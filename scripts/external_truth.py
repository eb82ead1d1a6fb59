"""External-truth runner: ONE command on any networked host.

The offline build gates everything against self-authored oracles and
synthetic fixtures (BASELINE.md / PARITY.md explain why). This script
closes the loop wherever network (and optionally the upstream packages)
exist, producing a single ledger ``EXTERNAL_TRUTH.md``:

1. fetch the reference's real Zenodo image tarball
   (``aliby_tpu.external_data.IMAGE_TARBALL``, sha256-pinned) and run the
   example-01 plate configuration over ``crop_cellpainting_256`` —
   reporting position discovery, the profiles row count, and the
   632-column schema anchor on REAL microscopy pixels;
2. fetch the 16 md5-pinned production Swain-lab logs and run
   ``parse_swainlab_logs`` over each (the reference's parser test corpus,
   ``/root/reference/tests/parsers/conftest.py``);
3. if ``cp_measure`` is importable: the per-feature golden-parity ledger
   (``scripts/golden_parity.compare_features``);
4. if ``cellpose`` is importable: mask IoU of CellposeTPU vs the real
   CellposeModel (``scripts/golden_parity.compare_masks``), plus the same
   on a real tarball field.

Usage:
    python scripts/external_truth.py [out.md]

Sections degrade gracefully: a missing package or a fetch failure is
recorded in the ledger, never fatal to the other sections.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def section_real_images() -> list[str]:
    lines = ["## Real image tarball (Zenodo 19411429)", ""]
    from aliby_tpu.external_data import IMAGE_DATASETS, get_image_data_root

    root = get_image_data_root()
    lines.append(f"- unpacked at `{root}`")
    entry = next(d for d in IMAGE_DATASETS if d["name"] == "crop_cellpainting_256")
    ds_path = root / entry["name"]
    if not ds_path.exists():
        lines.append(f"- **missing sub-dataset** {entry['name']} — tarball layout changed?")
        return lines

    from aliby_tpu.io.dataset import DatasetDir

    positions = DatasetDir(
        ds_path, regex=entry["regex"], capture_order=entry["capture_order"]
    ).get_position_ids()
    lines.append(f"- `{entry['name']}`: {len(positions)} position(s) discovered")

    # the example-01 configuration (builder defaults) on real pixels
    from aliby_tpu.engine.builders import build_pipeline_steps
    from aliby_tpu.parallel.positions import run_positions
    import tempfile

    pipeline = build_pipeline_steps(
        channels_to_segment={"nuclei": 0, "cell": 3},
        channels_to_extract=[0, 3],
        features_to_extract=("intensity",),
        cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
    )
    out = Path(tempfile.mkdtemp(prefix="external_truth_"))
    results = run_positions(
        pipeline, positions, out,
        regex=entry["regex"], capture_order=entry["capture_order"],
        overwrite=True,
    )
    for key, (profiles, _post) in results.items():
        lines.append(
            f"- position `{key}`: profiles {profiles.num_rows} rows x "
            f"{profiles.num_columns} cols"
        )
    # the full-bank 632-column anchor (examples/01:156-158) needs the full
    # default feature set; run it on the first position only (heavier)
    full = build_pipeline_steps(
        channels_to_segment={"nuclei": 0, "cell": 3},
        channels_to_extract=[0, 3],
        cp_measure_feature_kwargs={"intensity": {"edge_measurements": False}},
    )
    out2 = Path(tempfile.mkdtemp(prefix="external_truth_full_"))
    res2 = run_positions(
        full, positions[:1], out2,
        regex=entry["regex"], capture_order=entry["capture_order"],
        overwrite=True,
    )
    for key, (profiles, _post) in res2.items():
        anchor = "MATCHES" if profiles.num_columns == 632 else "DIFFERS FROM"
        lines.append(
            f"- full bank, position `{key}`: {profiles.num_rows} rows x "
            f"{profiles.num_columns} cols — {anchor} the reference's "
            "632-column anchor (examples/01:156-158)"
        )
    return lines


def section_real_logs() -> list[str]:
    lines = ["## Real Swain-lab logs (16 md5-pinned Zenodo records)", ""]
    from aliby_tpu.external_data import SWAINLAB_LOGS, get_swainlab_log
    from aliby_tpu.logparse.swainlab import parse_swainlab_logs

    ok = 0
    for name in SWAINLAB_LOGS:
        try:
            path = get_swainlab_log(name)
            meta = parse_swainlab_logs(path)
            channels = meta.get("channels") or []
            lines.append(
                f"- `{name}`: parsed, {len(channels)} channel(s): {channels}"
            )
            ok += 1
        except Exception as e:
            lines.append(f"- `{name}`: **FAILED** ({e!r})")
    lines.append("")
    lines.append(f"**{ok}/{len(SWAINLAB_LOGS)} real logs parsed.**")
    return lines


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("EXTERNAL_TRUTH.md")
    blocks: list[list[str]] = []
    header = [
        "# EXTERNAL TRUTH — real-artifact validation ledger",
        "",
        "Generated by `scripts/external_truth.py` on a networked host.",
        "",
    ]

    import scripts.golden_parity as gp

    for name, fn in (
        ("real images", section_real_images),
        ("real logs", section_real_logs),
        ("cp_measure features", gp.compare_features),
        ("cellpose masks", gp.compare_masks),
    ):
        try:
            blocks.append(fn())
        except Exception:
            blocks.append(
                [f"## {name}", "", "**section failed:**", "```",
                 traceback.format_exc(), "```"]
            )

    text = "\n".join(header + [line for b in blocks for line in b + [""]])
    out_path.write_text(text)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
