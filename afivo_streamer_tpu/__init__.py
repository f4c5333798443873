"""TPU-native streamer-discharge fluid simulation framework.

A ground-up JAX/XLA re-design of the capabilities of afivo-streamer
(reference: /root/reference): a plasma fluid model (drift-diffusion-reaction)
coupled to Poisson's equation on block-structured quadtree/octree AMR, with
geometric multigrid (FAS-FMG/V-cycle), tabulated transport data, a reaction
network chemistry engine, photoionization, electrodes, dielectrics and gas
dynamics.

Design: the octree of fixed-size boxes is a flat, shape-static batch of SoA
JAX arrays; host-side NumPy computes *index plans* (gather/scatter tables) at
refinement epochs; the device executes fully vectorized kernels over the box
batch. See SURVEY.md section 7 for the design translation table.
"""

__version__ = "0.1.0"

# Double precision is required to hold the reference's regression tolerances
# (rtol 1e-5 on ~1e18 densities through a multigrid solve); see SURVEY.md 7.3.
import jax

jax.config.update("jax_enable_x64", True)
