"""Convert a pretrained torch Cellpose checkpoint to a flax msgpack.

Usage:
    python scripts/port_cellpose_weights.py ~/.cellpose/models/cytotorch_0 \
        aliby_tpu/models/weights/cellpose_cyto.msgpack [--nbase 2,32,64,128,256]

The output loads via ``CellposeTPU(pretrained_path=..., model_kwargs=
{"arch": "cpnet", "nbase": (...)})`` — or point ``pretrained_path`` at the
torch file directly; ``CellposeTPU`` ports it on the fly
(``models/cpnet.py``). This script exists to pre-bake the conversion where
torch is not installed on the serving host.

Forward parity of the ported graph is pinned by ``tests/test_cpnet_port.py``
(float32 atol 2e-4 vs the torch graph).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_checkpoint")
    ap.add_argument("out_msgpack")
    ap.add_argument("--nbase", default="2,32,64,128,256")
    ap.add_argument("--nout", type=int, default=3)
    args = ap.parse_args()

    from flax import serialization

    from aliby_tpu.models.cpnet import load_cellpose_checkpoint

    nbase = tuple(int(x) for x in args.nbase.split(","))
    model, params = load_cellpose_checkpoint(
        args.torch_checkpoint, nbase=nbase, nout=args.nout
    )
    out = Path(args.out_msgpack)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(serialization.to_bytes(params))
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {out} ({n:,} params, nbase={nbase})")


if __name__ == "__main__":
    main()
