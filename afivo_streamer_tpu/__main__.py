"""Command-line entry point.

Usage (mirrors the reference's CLI, ``streamer.f90:61-75``):

    python -m afivo_streamer_tpu config.cfg [-key=value ...] [-ndim=N]

Any configuration key can be overridden on the command line; the resolved
configuration is written to ``<output%name>_out.cfg``.
"""

import sys

from .driver import Simulation


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    sim = Simulation(argv=argv)
    sim.cfg.write(sim.output.name + "_out.cfg")
    bf = sim.chem.get_breakdown_field_td(1.0e3)
    print(f" Estimated breakdown field (Td): {bf:12.4E}")
    sim.run()
    print("Computational cost breakdown (s)")
    print("  ".join(f"{k}={v:.2f}" for k, v in sim.wc.items()))


if __name__ == "__main__":
    main()
