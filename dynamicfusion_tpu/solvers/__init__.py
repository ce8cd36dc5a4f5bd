"""Solvers: rigid projective ICP and the non-rigid warp-field Gauss-Newton.

Replaces the reference's ``cuda::ProjectiveICP``
(/root/reference/kfusion/src/projective_icp.cpp) and both of its warp
solvers (Ceres host solver in optimisation.hpp, Opt/Terra GPU solver in
opt/CombinedSolver.h + solvers/dynamicfusion.t) with fully on-device jnp
implementations — no host round-trips inside the solve loops.
"""
