"""Plasma-model switch: local field approximation vs electron energy.

Reference ``src/m_model.f90:9-47``: ``model%type`` selects "lfa" (local
field approximation, default) or "ee" (electron energy equation with a 5/3
flux factor). The energy-equation branch is wired through
model_has_energy_equation.
"""

from __future__ import annotations


class Model:
    def __init__(self, cfg=None):
        self.type = "lfa"
        if cfg is not None:
            self.type = cfg.add_get(
                "model%type", "lfa", "Plasma model (lfa, ee)")
        if self.type not in ("lfa", "ee"):
            raise ValueError(f"unknown model type {self.type}")

    @property
    def has_energy_equation(self) -> bool:
        return self.type == "ee"
