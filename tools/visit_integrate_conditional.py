#!/usr/bin/env python3
"""Volume integral of a variable restricted to cells satisfying a
condition like ``ge(electric_fld, 3e6)`` (supported: ge/gt/le/lt on any
output variable), plus the integration volume. npz-based equivalent of
the reference's ``tools/visit_integrate_conditional.py``."""

import argparse
import re

import numpy as np

from gridnpz import GridData


def parse_condition(g, cond):
    m = re.match(r"\s*(ge|gt|le|lt)\(\s*([^,]+?)\s*,\s*([^)]+)\)\s*$",
                 cond)
    if not m:
        raise SystemExit(f"cannot parse condition: {cond!r} "
                         "(expected e.g. 'ge(electric_fld, 3e6)')")
    op, var, val = m.group(1), m.group(2), float(m.group(3))
    arr = g.data[var]
    return {"ge": arr >= val, "gt": arr > val,
            "le": arr <= val, "lt": arr < val}[op]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("filename", help="AMR grid npz")
    p.add_argument("variable")
    p.add_argument("-condition", default="ge(electric_fld, 3e6)")
    args = p.parse_args()

    g = GridData(args.filename)
    where = parse_condition(g, args.condition)
    total, vol = g.integrate(args.variable, where=where)
    print("integral volume")
    print(f"{total:.8E} {vol:.8E}")


if __name__ == "__main__":
    main()
