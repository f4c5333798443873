#!/usr/bin/env python3
"""Rewrite legacy named chemistry rate functions (``k1_func`` ...) in a
reactions/transport-data file to the general expression format that the
parser accepts (physics/chemistry.py:40-57 lists the expression forms).
Creates a ``.bak`` backup. Reference analog:
``tools/chemistry_update_reactions.sh``."""

import argparse
import shutil

# legacy name -> expression form (the definitions of the old named rate
# functions, as documented for the reference's chemistry module)
LEGACY = {
    "constant": "c1",
    "linear": "c1*(Td-c2)",
    "exp_v1": "c1*exp(-(c2/(c3+Td))**2)",
    "exp_v2": "c1*exp(-(Td/c2)**2)",
    "k1_func": "c1*(300/Te)**c2",
    "k2_func": "c1",
    "k3_func": "(c1*(kB_eV*Te+c2)**2-c3)*c4",
    "k4_func": "c1*(Tg/300)**c2*exp(-c3/Tg)",
    "k5_func": "c1*exp(-c2/Tg)",
    "k6_func": "c1*Tg**c2",
    "k7_func": "c1*(Tg/c2)**c3",
    "k8_func": "c1*(300/Tg)**c2",
    "k9_func": "c1*exp(-c2*Tg)",
    "k10_func": "10**(c1+c2*(Tg-300))",
    "k11_func": "c1*(300/Tg)**c2*exp(-c3/Tg)",
    "k12_func": "c1*Tg**c2*exp(-c3/Tg)",
    "k13_func": "c1*exp(-(c2/(c3+Td))**c4)",
    "k14_func": "c1*exp(-(Td/c2)**c3)",
    "k15_func": "c1*exp(-(c2/(kb*(Tg+Td/c3)))**c4)",
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_file")
    args = p.parse_args()

    shutil.copyfile(args.input_file, args.input_file + ".bak")
    with open(args.input_file) as f:
        text = f.read()
    n = 0
    # longest names first so e.g. k10_func is not clobbered by k1_func
    for name in sorted(LEGACY, key=len, reverse=True):
        if name in text:
            n += text.count(name)
            text = text.replace(name, LEGACY[name])
    with open(args.input_file, "w") as f:
        f.write(text)
    print(f"replaced {n} occurrences "
          f"(backup in {args.input_file}.bak)")


if __name__ == "__main__":
    main()
