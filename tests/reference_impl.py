"""Brute-force O(N^2) numpy implementation of the SPH physics contract.

Independent ground truth for the framework's grid-based passes: every
pairwise quantity is computed over ALL particle pairs (no spatial
acceleration structure), in float64, from the formulas in the reference
CUDA code (cited per function). Used only by tests.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6
PI = np.pi


# -- kernels (src/CUDAFunctions.cuh:23-98) -----------------------------

def w_cubic(r, h):
    q = 2.0 * np.abs(r) / h
    a = 0.25 / (PI * h ** 3)
    val = a * np.where(q > 1.0, (2.0 - q) ** 3, (3.0 * q - 6.0) * q * q + 4.0)
    return np.where((q >= EPS) & (q <= 2.0), val, 0.0)


def grad_w_cubic(rvec, h):
    r = np.linalg.norm(rvec, axis=-1)
    q = 2.0 * r / h
    f = np.where(q > 1.0, (12.0 - 3.0 * q) * q - 12.0, (9.0 * q - 12.0) * q)
    coef = np.where(q <= 2.0, f / (PI * (q + EPS) * h ** 5), 0.0)
    return coef[..., None] * rvec


def w_visc_laplacian(r, h):
    return np.where(r <= h, 45.0 * (h - r) / (PI * h ** 6), 0.0)


def grad_w_surface(rvec, h):
    x = np.linalg.norm(rvec, axis=-1)
    piece = np.where(
        2.0 * x <= h,
        2.0 * (h - x) ** 3 * x ** 3 - 0.0156 * h ** 6,
        (h - x) ** 3 * x ** 3,
    )
    coef = np.where(
        (x >= EPS) & (x <= h),
        -136.0241 * piece / (PI * h ** 9 * np.maximum(x, EPS)),
        0.0,
    )
    return coef[..., None] * rvec


# -- pair helpers ------------------------------------------------------

def _rel(pos_i, pos_j):
    rel = pos_i[:, None, :].astype(np.float64) - pos_j[None, :, :].astype(np.float64)
    return rel, np.linalg.norm(rel, axis=-1)


# -- passes ------------------------------------------------------------

def density(pos, mass, bpos, bmass, h):
    """src/BasicSPHSolver.cu:54-83."""
    _, rf = _rel(pos, pos)
    _, rb = _rel(pos, bpos)
    return w_cubic(rf, h) @ mass + w_cubic(rb, h) @ bmass


def tait_pressure(rho, rho0, stiff):
    return np.maximum(stiff * ((rho / rho0) ** 7 - 1.0), 0.0)


def pressure_accel(pos, mass, rho, p, bpos, bmass, h, max_a=1000.0):
    """src/BasicSPHSolver.cu:113-165 (i != j skipped; grad(0)=0 anyway)."""
    relf, _ = _rel(pos, pos)
    gw = grad_w_cubic(relf, h)
    over = p / np.maximum(EPS, rho * rho)
    coef = -(mass[None, :]) * (over[:, None] + over[None, :])
    np.fill_diagonal(coef, 0.0)
    a = np.einsum("ij,ijk->ik", coef, gw)
    relb, _ = _rel(pos, bpos)
    gwb = grad_w_cubic(relb, h)
    a += np.einsum("ij,ijk->ik", -(bmass[None, :]) * over[:, None], gwb)
    norm = np.linalg.norm(a, axis=-1, keepdims=True)
    return np.where(norm > max_a, a / np.maximum(norm, EPS) * max_a, a)


def viscosity_dv(pos, vel, mass, h, rho0, visc, dt):
    """src/BasicSPHSolver.cu:183-225 (fluid-fluid only)."""
    _, r = _rel(pos, pos)
    lap = w_visc_laplacian(r, h)
    coef = mass[None, :] * lap / rho0
    dv = np.einsum("ij,ijk->ik", coef, vel[None, :, :] - vel[:, None, :])
    return visc * dt * dv


def xsph_dv(pos, vel, mass, h, rho0, c):
    """src/PBDSolver.cu:89-125."""
    _, r = _rel(pos, pos)
    coef = mass[None, :] * w_cubic(r, h)
    dv = np.einsum("ij,ijk->ik", coef, vel[None, :, :] - vel[:, None, :])
    return c * dv / rho0


def color_gradient(pos, mass, bpos, bmass, h, rho0, rhoB):
    """src/BasicSPHSolver.cu:277-318."""
    relf, rf = _rel(pos, pos)
    relb, rb = _rel(pos, bpos)
    volf = mass[None, :] / rho0
    volb = bmass[None, :] / rhoB
    num = np.einsum("ij,ijk->ik", volf, grad_w_cubic(relf, h)) \
        + np.einsum("ij,ijk->ik", volb, grad_w_cubic(relb, h))
    den = (volf * w_cubic(rf, h)).sum(1) + (volb * w_cubic(rb, h)).sum(1)
    return num / np.maximum(EPS, den)[:, None]


def surface_accel(pos, mass, cg, h, rho0, kappa, air_p):
    """src/BasicSPHSolver.cu:332-370 (fluid-fluid only)."""
    relf, _ = _rel(pos, pos)
    c2 = (cg * cg).sum(-1)
    st_coef = 0.25 * mass[None, :] / rho0 ** 2 * kappa * (c2[:, None] + c2[None, :])
    a = np.einsum("ij,ijk->ik", st_coef, grad_w_surface(relf, h))
    ni = np.sqrt(c2)
    gate = ni / np.maximum(EPS, ni)
    ap_coef = air_p * mass[None, :] / rho0 ** 2 * gate[:, None]
    a += np.einsum("ij,ijk->ik", ap_coef, grad_w_cubic(relf, h))
    return a


# -- DFSPH passes (src/DFSPHSolver.cu) ---------------------------------

def density_alpha(pos, mass, bpos, bmass, h, eps=EPS):
    """src/DFSPHSolver.cu:212-249."""
    relf, rf = _rel(pos, pos)
    relb, rb = _rel(pos, bpos)
    rho = w_cubic(rf, h) @ mass + w_cubic(rb, h) @ bmass
    mgf = mass[None, :, None] * grad_w_cubic(relf, h)
    mgb = bmass[None, :, None] * grad_w_cubic(relb, h)
    gsum = mgf.sum(1) + mgb.sum(1)
    slam = (mgf * mgf).sum(-1).sum(1)  # fluid neighbors only
    alpha = -1.0 / np.maximum(eps, (gsum * gsum).sum(-1) + slam)
    return rho, alpha


def velocity_divergence(pos, vel, mass, bpos, bmass, h):
    """src/DFSPHSolver.cu:74-92."""
    relf, _ = _rel(pos, pos)
    gwf = grad_w_cubic(relf, h)
    dv = vel[:, None, :] - vel[None, :, :]
    e = (mass[None, :] * (dv * gwf).sum(-1)).sum(1)
    relb, _ = _rel(pos, bpos)
    gwb = grad_w_cubic(relb, h)
    e += (bmass[None, :] * (vel[:, None, :] * gwb).sum(-1)).sum(1)
    return e


def stiffness_accel(pos, mass, stiff, bpos, bmass, h):
    """src/DFSPHSolver.cu:118-136."""
    relf, _ = _rel(pos, pos)
    gwf = grad_w_cubic(relf, h)
    coef = mass[None, :] * (stiff[:, None] + stiff[None, :])
    a = np.einsum("ij,ijk->ik", coef, gwf)
    relb, _ = _rel(pos, bpos)
    gwb = grad_w_cubic(relb, h)
    a += np.einsum("ij,ijk->ik", bmass[None, :] * stiff[:, None], gwb)
    return a


# -- PBD passes (src/PBDSolver.cu:127-210) -----------------------------

def density_lambda(pos, mass, bpos, bmass, h, rho0, relaxation):
    allpos = np.concatenate([pos, bpos], 0)
    allmass = np.concatenate([mass, bmass], 0)
    rel, r = _rel(pos, allpos)
    rho = w_cubic(r, h) @ allmass
    g = -allmass[None, :, None] * grad_w_cubic(rel, h) / rho0
    gsum = -g.sum(1)
    slam = (g * g).sum(-1).sum(1)
    lam = np.where(
        rho > rho0,
        -(rho / rho0 - 1.0) / ((gsum * gsum).sum(-1) + slam + EPS),
        0.0,
    )
    return rho, relaxation * lam


def delta_pos(pos, mass, lam, bpos, bmass, h, rho0):
    relf, _ = _rel(pos, pos)
    gwf = grad_w_cubic(relf, h)
    coef = mass[None, :] * (lam[:, None] + lam[None, :])
    dp = np.einsum("ij,ijk->ik", coef, gwf)
    relb, _ = _rel(pos, bpos)
    gwb = grad_w_cubic(relb, h)
    dp += np.einsum("ij,ijk->ik", bmass[None, :] * lam[:, None], gwb)
    return dp / rho0


def boundary_mass(bpos, h, rhoB):
    """Akinci boundary mass (src/SPHSystem.cu:92-105).

    Sparse pair enumeration via cKDTree instead of the dense (nb, nb)
    matrix: identical float64 math (w_cubic is zero beyond h and the
    q < EPS cut zeroes self/coincident pairs), but the dam boundary is
    ~14k particles — the dense form materialises ~8 GB of temporaries
    and dominated the quick test tier."""
    from scipy.spatial import cKDTree
    bpos = np.asarray(bpos, np.float64)
    pairs = cKDTree(bpos).query_pairs(h, output_type="ndarray")
    r = np.linalg.norm(bpos[pairs[:, 0]] - bpos[pairs[:, 1]], axis=1)
    w = w_cubic(r, h)
    wsum = np.zeros(len(bpos))
    np.add.at(wsum, pairs[:, 0], w)
    np.add.at(wsum, pairs[:, 1], w)
    return rhoB / np.maximum(EPS, wsum)


# -- full DFSPH step (src/DFSPHSolver.cu:33-72) ------------------------

def dfsph_step(pos, vel, mass, bpos, bmass, cfg, dt, warm_stiff):
    """One full DFSPH frame, all-pairs, float64 — including the reference's
    warm-start semantics: the carried stiffness is applied through the SAME
    correction kernel as in-loop iterations, i.e. vel += a/dt
    (src/DFSPHSolver.cu project: correctDensityError_CUDA does
    ``velFluid[i] += a / dt``), while the divergence loop's correction is
    vel += a (``velFluid[i] += a; // dt is already included``).
    Returns (pos, vel, rho, new_warm_stiff, div_iters, den_iters)."""
    pos = pos.astype(np.float64)
    vel = vel.astype(np.float64)
    warm_stiff = np.asarray(warm_stiff, np.float64)
    h = cfg.radius
    n = pos.shape[0]
    rho, alpha = density_alpha(pos, mass, bpos, bmass, h, cfg.epsilon)

    # divergence solve (src/DFSPHSolver.cu:331-363)
    tau_div = cfg.dfsph_divergence_threshold * n * cfg.rho0

    def div_error(v):
        e = velocity_divergence(pos, v, mass, bpos, bmass, h)
        err = np.maximum(0.0, e)
        err = np.where((rho + dt * err < cfg.rho0) & (rho <= cfg.rho0),
                       0.0, err)
        return err, err * alpha

    err, stiff = div_error(vel)
    div_it, total = 0, np.inf
    while (div_it < 1 or total > tau_div) and div_it < cfg.dfsph_max_iter:
        vel = vel + stiffness_accel(pos, mass, stiff, bpos, bmass, h)
        err, stiff = div_error(vel)
        total = np.abs(err).sum()
        div_it += 1

    # non-pressure forces (inherited BasicSPH force/diffuse/surface)
    vel = vel + dt * np.asarray(cfg.gravity)
    vel = vel + viscosity_dv(pos, vel, mass, h, cfg.rho0, cfg.visc, dt)
    if cfg.surface_tension > EPS or cfg.air_pressure > EPS:
        cg = color_gradient(pos, mass, bpos, bmass, h, cfg.rho0,
                            cfg.rho_boundary)
        vel = vel + surface_accel(pos, mass, cg, h, cfg.rho0,
                                  cfg.surface_tension, cfg.air_pressure) * dt

    # density solve with warm start (src/DFSPHSolver.cu:160-210)
    tau_den = cfg.dfsph_density_threshold * n * cfg.rho0

    def den_error(v):
        e = velocity_divergence(pos, v, mass, bpos, bmass, h)
        err = np.maximum(0.0, dt * e + rho - cfg.rho0)
        return err, err * alpha

    vel = vel + stiffness_accel(pos, mass, warm_stiff, bpos, bmass, h) / dt
    err, stiff = den_error(vel)
    warm = stiff.copy()
    den_it, total = 0, np.inf
    while (den_it < 2 or total > tau_den) and den_it < cfg.dfsph_max_iter:
        vel = vel + stiffness_accel(pos, mass, stiff, bpos, bmass, h) / dt
        err, stiff = den_error(vel)
        warm = warm + stiff
        den_it += 1
        if den_it >= 2:
            total = np.abs(err).sum()

    pos, vel = enforce_boundary(pos + dt * vel, vel,
                                np.asarray(cfg.space_size))
    return pos, vel, rho, warm, div_it, den_it


# -- full PBD step (src/PBDSolver.cu:34-73) ----------------------------

def pbd_step(pos, vel, mass, bpos, bmass, cfg, dt, pos_last):
    """One full PBD frame, all-pairs, float64, following the reference's
    step order (src/PBDSolver.cu:34-73): project (fixed maxIter=20
    position-constraint iterations, src/PBDSolver.cu:225-258), velocity
    from the position delta vs ``pos_last`` (:55-60), XSPH viscosity
    (:89-125), surface effects, gravity, then remember-position + advect
    with the full wall clamp (predict, :71-79). First-frame semantics: the
    reference initialises ``fluidPosLast`` and SKIPS the whole first step
    via a thrown exception (:44-47); this framework instead sets
    ``pos_last = pos`` at carry creation and runs frame 1 normally —
    callers of this oracle pass ``pos_last`` explicitly, so both semantics
    can be expressed.
    Returns (pos, vel, rho, new_pos_last, n_project_iters)."""
    pos = pos.astype(np.float64)
    vel = vel.astype(np.float64)
    pos_last = pos_last.astype(np.float64)
    h = cfg.radius
    space = np.asarray(cfg.space_size)

    it = 0
    rho = np.zeros(pos.shape[0])
    for it in range(1, cfg.pbd_max_iter + 1):
        rho, lam = density_lambda(pos, mass, bpos, bmass, h, cfg.rho0,
                                  cfg.pbd_relaxation)
        dp = delta_pos(pos, mass, lam, bpos, bmass, h, cfg.rho0)
        # position-only clamp inside projection (src/PBDSolver.cu:212-223)
        pos = np.clip(pos + dp, 0.0 * space, 0.99 * space)

    vel = (pos - pos_last) / dt
    vel = vel + xsph_dv(pos, vel, mass, h, cfg.rho0, cfg.pbd_xsph_c)
    if cfg.surface_tension > EPS or cfg.air_pressure > EPS:
        cg = color_gradient(pos, mass, bpos, bmass, h, cfg.rho0,
                            cfg.rho_boundary)
        vel = vel + surface_accel(pos, mass, cg, h, cfg.rho0,
                                  cfg.surface_tension, cfg.air_pressure) * dt
    vel = vel + dt * np.asarray(cfg.gravity)

    pos_last = pos.copy()
    pos, vel = enforce_boundary(pos + dt * vel, vel, space)
    return pos, vel, rho, pos_last, it


def pbd_project_binned(pos, mass, bpos, bmass, cfg, n_iter,
                       rebin_moving: bool):
    """The PBD projection loop with GRID-BINNED candidate masks, float64 —
    isolates the one documented fidelity divergence (PARITY.md #2): the
    reference recomputes particle i's 27-cell stencil from its *moving*
    position every iteration against cellStart ranges sorted at step start
    (src/PBDSolver.cu:154-156 — ``make_int3(posFluid[i] / cellLength)``
    inside computeDensityLambda_CUDA), while this framework keeps the
    start-of-step cell assignment for both sides of every pair.

    ``rebin_moving=True`` reproduces the reference's choice,
    ``rebin_moving=False`` this framework's. j-candidacy always uses the
    start-of-step cell (the sorted ranges are static in both designs).
    Returns the projected positions after ``n_iter`` iterations."""
    pos = pos.astype(np.float64)
    space = np.asarray(cfg.space_size)
    h, cl = cfg.radius, cfg.cell_length

    cell_j = np.floor(pos / cl).astype(np.int64)        # start-of-step
    bcell = np.floor(bpos / cl).astype(np.int64)

    def masks(p):
        ci = np.floor(p / cl).astype(np.int64) if rebin_moving else cell_j
        mf = (np.abs(ci[:, None, :] - cell_j[None, :, :]) <= 1).all(-1)
        mb = (np.abs(ci[:, None, :] - bcell[None, :, :]) <= 1).all(-1)
        return mf, mb

    for _ in range(n_iter):
        mf, mb = masks(pos)
        # density + lambda (src/PBDSolver.cu:127-168) under the masks
        relf, rf = _rel(pos, pos)
        relb, rb = _rel(pos, bpos)
        wf = w_cubic(rf, h) * mf
        wb = w_cubic(rb, h) * mb
        rho = wf @ mass + wb @ bmass
        gf = -mass[None, :, None] * grad_w_cubic(relf, h) / cfg.rho0 \
            * mf[..., None]
        gb = -bmass[None, :, None] * grad_w_cubic(relb, h) / cfg.rho0 \
            * mb[..., None]
        gsum = -(gf.sum(1) + gb.sum(1))
        slam = (gf * gf).sum(-1).sum(1) + (gb * gb).sum(-1).sum(1)
        lam = np.where(
            rho > cfg.rho0,
            -(rho / cfg.rho0 - 1.0) / ((gsum * gsum).sum(-1) + slam + EPS),
            0.0) * cfg.pbd_relaxation
        # delta-pos (src/PBDSolver.cu:170-210) under the same masks
        gwf = grad_w_cubic(relf, h) * mf[..., None]
        gwb = grad_w_cubic(relb, h) * mb[..., None]
        dp = np.einsum("ij,ijk->ik",
                       mass[None, :] * (lam[:, None] + lam[None, :]), gwf)
        dp += np.einsum("ij,ijk->ik", bmass[None, :] * lam[:, None], gwb)
        pos = np.clip(pos + dp / cfg.rho0, 0.0 * space, 0.99 * space)
    return pos


# -- full WCSPH step (src/BasicSPHSolver.cu:237-260) -------------------

def enforce_boundary(pos, vel, space):
    lo = 0.0 * space
    hi = 0.99 * space
    at_lo = pos <= lo
    at_hi = pos >= hi
    pos = np.clip(pos, lo, hi)
    vel = np.where(at_lo, np.maximum(vel, 0.0), vel)
    vel = np.where(at_hi, np.minimum(vel, 0.0), vel)
    return pos, vel


def wcsph_step(pos, vel, mass, bpos, bmass, cfg, dt):
    """One full WCSPH frame, all-pairs, float64."""
    pos = pos.astype(np.float64)
    vel = vel.astype(np.float64)
    h = cfg.radius
    vel = vel + dt * np.asarray(cfg.gravity)
    vel = vel + viscosity_dv(pos, vel, mass, h, cfg.rho0, cfg.visc, dt)
    if cfg.surface_tension > EPS or cfg.air_pressure > EPS:
        cg = color_gradient(pos, mass, bpos, bmass, h, cfg.rho0,
                            cfg.rho_boundary)
        vel = vel + surface_accel(pos, mass, cg, h, cfg.rho0,
                                  cfg.surface_tension, cfg.air_pressure) * dt
    rho = density(pos, mass, bpos, bmass, h)
    p = tait_pressure(rho, cfg.rho0, cfg.stiff)
    vel = vel + pressure_accel(pos, mass, rho, p, bpos, bmass, h,
                               cfg.max_accel) * dt
    pos, vel = enforce_boundary(pos + dt * vel, vel,
                                np.asarray(cfg.space_size))
    return pos, vel, rho, p
