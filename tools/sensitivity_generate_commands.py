#!/usr/bin/env python3
"""Generate the command list for a chemistry sensitivity study: one run
per (reaction index, rate factor) with ``input_data%modified_reaction_ix``
/ ``input_data%modified_rate_factors`` (physics/chemistry.py) and a
distinguishable output name, plus the unmodified base case. Feed the
resulting file to e.g. ``bash commands.txt`` and analyze with
``tools/sensitivity_analyze_results.py``. Reference analog:
``tools/sensitivity_generate_commands.py``."""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cfg_file", help="base config file")
    p.add_argument("-command_file", default="commands.txt")
    p.add_argument("-ndim", type=int, default=2)
    p.add_argument("-ix_range", type=int, nargs=2, required=True,
                   help="index range (1-based, inclusive) of reactions")
    p.add_argument("-rate_factors", type=float, nargs="+",
                   default=[0.8, 1.2])
    args = p.parse_args()

    runner = f"python -m afivo_streamer_tpu {args.cfg_file} -ndim={args.ndim}"
    cmds = [f"{runner} -output%name+=_ix{0:04d}_fac1.0"]
    for ix in range(args.ix_range[0], args.ix_range[1] + 1):
        for fac in args.rate_factors:
            cmds.append(
                f"{runner} -input_data%modified_reaction_ix={ix} "
                f"-input_data%modified_rate_factors={fac} "
                f"-output%name+=_ix{ix:04d}_fac{fac}")
    with open(args.command_file, "w") as f:
        f.write("\n".join(cmds) + "\n")
    print(f"wrote {len(cmds)} commands to {args.command_file}")


if __name__ == "__main__":
    main()
