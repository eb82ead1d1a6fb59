"""Profile the host side of the mesh-runner bench: where do the
~0.15 s/fov-tp go on a 1-core host? Runs the same workload as
bench._bench_mesh_runner (8 positions x 3 tps, full bank) twice (warm,
measured) under cProfile and prints the top cumulative entries of the
measured run.
"""

from __future__ import annotations

import cProfile
import pstats
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _bench_mesh_runner, build_workload  # noqa: E402


def main():
    # warm pass is inside _bench_mesh_runner already (out_warm). Profile the
    # whole call; the warm pass shows up under its own frame so the measured
    # run can be read off the second run_positions_mesh invocation.
    prof = cProfile.Profile()
    prof.enable()
    fovs = _bench_mesh_runner(build_workload, 8, file=sys.stderr)
    prof.disable()
    print(f"# mesh fov/s: {fovs:.3f}", file=sys.stderr)
    st = pstats.Stats(prof, stream=sys.stdout)
    st.sort_stats("cumulative")
    st.print_stats(45)
    st.sort_stats("tottime")
    st.print_stats(30)


if __name__ == "__main__":
    main()
