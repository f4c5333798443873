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
    total = max(sum(sim.wc.values()), 1e-300)
    print("Computational cost breakdown (%)")
    print("".join(f"{k:>10}" for k in sim.wc))
    print("".join(f"{100 * v / total:10.2f}" for v in sim.wc.values()))


if __name__ == "__main__":
    main()
