"""User code for the animation_2d program (``m_user.f90``: template only,
runs with the default routines)."""


def user_initialize(cfg, sim):
    pass
