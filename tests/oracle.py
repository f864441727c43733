"""Brute-force numpy oracles for the streaming / coupling / stencil ops.

These transliterate the per-cell semantics of the reference CUDA kernels
(`propagation.cu`, `solid_fluid_coupling.cu`, `collision_2d.cu`) into
plain sequential numpy, used ONLY by the test suite to validate the
vectorised jnp implementations on small random grids. They are written
for clarity, not speed.
"""

from __future__ import annotations

import numpy as np

E = np.array(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1], [1, 1], [-1, 1], [-1, -1], [1, -1]],
    dtype=np.int32,
)
W = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4, dtype=np.float64)
REFL = [0, 3, 4, 1, 2, 7, 8, 5, 6]
MX = [0, 3, 2, 1, 4, 6, 5, 8, 7]
MY = [0, 1, 4, 3, 2, 8, 7, 6, 5]

FLUID, OBSTACLE, INFLOW, OUTFLOW, INFLOW_2 = 1, 2, 8, 16, 32


def _feq_point(rho, ux, uy):
    cs2 = 1.0 / 3.0
    uv = ux * ux + uy * uy
    out = np.zeros(9)
    for q in range(9):
        eu = ux * E[q, 0] + uy * E[q, 1]
        out[q] = rho * W[q] * (1.0 + eu / cs2)
        out[q] += rho * W[q] * (0.5 * eu * eu / cs2 / cs2 - 0.5 * uv / cs2)
    return out


def propagate_oracle(
    f,
    flags,
    phi_obs=None,
    rho=None,
    vel=None,
    inflow_vel=None,
    inflow_density=None,
    axisymmetric_type=0,
):
    """Sequential port of kernel_prop_2d_forward (propagation.cu:22-488).

    OUTFLOW is applied as a second pass over the completed streamed field
    (the deterministic version of the reference's racy read), matching
    jrl_lbm_tpu.ops.stream.
    """
    f = np.asarray(f, dtype=np.float64)
    Qn, H, Wd = f.shape
    f_new = f.copy()
    rho = None if rho is None else np.array(rho, dtype=np.float64)
    vel = None if vel is None else np.array(vel, dtype=np.float64)

    for y in range(H):
        for x in range(Wd):
            fl = flags[y, x]
            on_x = x == 0 and axisymmetric_type == 1
            on_y = y == 0 and axisymmetric_type == 2

            if on_x:
                x_neg = 0
            elif fl == FLUID:
                x_neg = (x - 1 + Wd) % Wd
            else:
                x_neg = 1 if x - 1 < 0 else x - 1
            if fl == FLUID:
                x_pos = (x + 1) % Wd
            else:
                x_pos = Wd - 2 if x + 1 >= Wd else x + 1
            if on_y:
                y_neg = 0
            elif fl == FLUID:
                y_neg = (y - 1 + H) % H
            else:
                y_neg = 1 if y - 1 < 0 else y - 1
            if fl == FLUID:
                y_pos = (y + 1) % H
            else:
                y_pos = H - 2 if y + 1 >= H else y + 1

            income = [
                (y, x),
                (y, x_neg),
                (y_neg, x),
                (y, x_pos),
                (y_pos, x),
                (y_neg, x_neg),
                (y_neg, x_pos),
                (y_pos, x_pos),
                (y_pos, x_neg),
            ]
            outcome = [
                (y, x),
                (y, x_pos),
                (y_pos, x),
                (y, x_neg),
                (y_neg, x),
                (y_pos, x_pos),
                (y_pos, x_neg),
                (y_neg, x_neg),
                (y_neg, x_pos),
            ]

            f_new[0, y, x] = f[0, y, x]
            if fl == OBSTACLE:
                for q in range(1, 9):
                    iq = q
                    if on_x and q in (5, 8, 1):
                        iq = MX[q]
                    elif on_y and q in (5, 6, 2):
                        iq = MY[q]
                    f_new[REFL[q], y, x] = f[iq, income[q][0], income[q][1]]
            else:
                for q in range(1, 9):
                    iq = q
                    if on_x and q in (5, 8, 1):
                        iq = MX[q]
                    elif on_y and q in (5, 6, 2):
                        iq = MY[q]
                    ny, nx = income[q]
                    if flags[ny, nx] != OBSTACLE:
                        f_new[q, y, x] = f[iq, ny, nx]
                    else:
                        f_this = f[REFL[q], y, x]
                        if phi_obs is None:
                            f_new[q, y, x] = f_this
                        else:
                            t = phi_obs[y, x]
                            if 0.5 <= t <= 1.0:
                                t1 = 2 * t - 1
                                f_prev = f[iq, ny, nx]
                                f_new[q, y, x] = t1 * f_prev + (1 - t1) * f_this
                            elif 0.0 <= t <= 0.5:
                                oq = q
                                if on_x and q in (6, 7, 3):
                                    oq = MX[q]
                                elif on_y and q in (7, 8, 4):
                                    oq = MY[q]
                                t2 = 2 * t
                                f_next = f[REFL[oq], outcome[q][0], outcome[q][1]]
                                f_new[q, y, x] = t2 * f_this + (1 - t2) * f_next
                            else:
                                f_new[q, y, x] = f_this

    # INFLOW pass
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == INFLOW:
                if rho is not None and inflow_density is not None and inflow_density >= 0:
                    rho[y, x] = inflow_density
                    rho_t = inflow_density
                elif rho is not None:
                    rho_t = rho[y, x]
                elif inflow_density is not None and inflow_density >= 0:
                    rho_t = inflow_density
                else:
                    rho_t = 0.0
                if vel is not None and inflow_vel is not None:
                    vel[0, y, x] = inflow_vel[0]
                    vel[1, y, x] = inflow_vel[1]
                    ux, uy = inflow_vel
                elif vel is not None:
                    ux, uy = vel[0, y, x], vel[1, y, x]
                elif inflow_vel is not None:
                    ux, uy = inflow_vel
                else:
                    ux = uy = 0.0
                f_new[:, y, x] = _feq_point(rho_t, ux, uy)
            elif flags[y, x] == INFLOW_2:
                ux = 0.0 if vel is None else vel[0, y, x]
                uy = 0.0 if vel is None else vel[1, y, x]
                if rho is not None:
                    rho[y, x] = 1.0
                f_new[:, y, x] = _feq_point(1.0, ux, uy)

    # OUTFLOW second pass over completed f_new
    g = f_new.copy()
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OUTFLOW:
                fy, fx = y, x
                if x == 0:
                    fx = 1
                elif x == Wd - 1:
                    fx = Wd - 2
                if y == 0:
                    fy = 1
                elif y == H - 1:
                    fy = H - 2
                f_new[:, y, x] = g[:, fy, fx]

    return rho, vel, f_new


def _minmax_neighbors(flags, y, x, H, Wd, axisymmetric_type):
    fl = flags[y, x]
    on_x = x == 0 and axisymmetric_type == 1
    on_y = y == 0 and axisymmetric_type == 2
    if on_x:
        neg_x = 0
    elif fl == FLUID:
        neg_x = (x - 1 + Wd) % Wd
    else:
        neg_x = max(0, x - 1)
    pos_x = (x + 1) % Wd if fl == FLUID else min(Wd - 1, x + 1)
    if on_y:
        neg_y = 0
    elif fl == FLUID:
        neg_y = (y - 1 + H) % H
    else:
        neg_y = max(0, y - 1)
    pos_y = (y + 1) % H if fl == FLUID else min(H - 1, y + 1)
    # outcome order matching the CUDA kernels
    return [
        (y, x),
        (y, pos_x),
        (pos_y, x),
        (y, neg_x),
        (neg_y, x),
        (pos_y, pos_x),
        (pos_y, neg_x),
        (neg_y, neg_x),
        (neg_y, pos_x),
    ]


def grad_oracle(rho, flags, dx=1.0, axisymmetric_type=0):
    """Sequential port of kernel_get_grad_2d_forward (collision_2d.cu:22-148)."""
    rho = np.asarray(rho, dtype=np.float64)
    H, Wd = rho.shape
    out = np.zeros((2, H, Wd))
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OBSTACLE:
                continue
            oc = _minmax_neighbors(flags, y, x, H, Wd, axisymmetric_type)

            gx = 0.0
            det = False
            if flags[oc[1]] != OBSTACLE and flags[oc[3]] != OBSTACLE:
                gx += 4 * (rho[oc[1]] - rho[oc[3]])
            else:
                det = True
            if flags[oc[5]] != OBSTACLE and flags[oc[6]] != OBSTACLE:
                gx += rho[oc[5]] - rho[oc[6]]
            else:
                det = True
            if flags[oc[7]] != OBSTACLE and flags[oc[8]] != OBSTACLE:
                gx += rho[oc[8]] - rho[oc[7]]
            else:
                det = True
            out[0, y, x] = 0.0 if det else gx

            gy = 0.0
            det = False
            if flags[oc[2]] != OBSTACLE and flags[oc[4]] != OBSTACLE:
                gy += 4 * (rho[oc[2]] - rho[oc[4]])
            else:
                det = True
            if flags[oc[5]] != OBSTACLE and flags[oc[8]] != OBSTACLE:
                gy += rho[oc[5]] - rho[oc[8]]
            else:
                det = True
            if flags[oc[6]] != OBSTACLE and flags[oc[7]] != OBSTACLE:
                gy += rho[oc[6]] - rho[oc[7]]
            else:
                det = True
            out[1, y, x] = 0.0 if det else gy
    return out / (12.0 * dx)


def div_oracle(vel, flags, dx=1.0, axisymmetric_type=0):
    """Sequential port of kernel_get_div_2d_forward (collision_2d.cu:150-220)."""
    vel = np.asarray(vel, dtype=np.float64)
    _, H, Wd = vel.shape
    out = np.zeros((H, Wd))
    u, v = vel[0], vel[1]
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OBSTACLE:
                continue
            oc = _minmax_neighbors(flags, y, x, H, Wd, axisymmetric_type)
            d = 4 * (u[oc[1]] - u[oc[3]]) + (u[oc[5]] - u[oc[6]]) + (u[oc[8]] - u[oc[7]])
            d += 4 * (v[oc[2]] - v[oc[4]]) + (v[oc[5]] - v[oc[8]]) + (v[oc[6]] - v[oc[7]])
            out[y, x] = d / (12.0 * dx)
    return out


def solve_boundary_oracle(
    vel, flags, f, phi_obs, obs_vel=None, tau=1.0, axisymmetric_type=0, dx=1.0, dt=1.0
):
    """Sequential port of kernel_2d_forward (solid_fluid_coupling.cu:25-252)."""
    f = np.asarray(f, dtype=np.float64)
    vel = np.asarray(vel, dtype=np.float64)
    _, H, Wd = f.shape
    f_new = f.copy()
    c = dx / dt
    cs2 = c * c / 3.0
    eps = 1e-10

    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OBSTACLE:
                continue
            if x == Wd - 1 or y == H - 1:
                continue
            on_x = x == 0 and axisymmetric_type == 1
            on_y = y == 0 and axisymmetric_type == 2
            oc = _minmax_neighbors(flags, y, x, H, Wd, axisymmetric_type)
            income = [oc[0], oc[3], oc[4], oc[1], oc[2], oc[7], oc[8], oc[5], oc[6]]

            vel_tgt = np.zeros(2)
            rho_tgt = 0.0
            is_obs = [False] * 9
            cnt = 0
            for q in range(9):
                qi = REFL[q]
                if flags[oc[q]] == OBSTACLE:
                    t = phi_obs[y, x]
                    if -eps < t <= 1 + eps:
                        is_obs[q] = True
                        cnt += 1
                        ux = vel[0][income[q]]
                        uy = vel[1][income[q]]
                        if on_x and q in (1, 5, 8):
                            ux = -ux
                        if on_y and q in (2, 5, 6):
                            uy = -uy
                        if obs_vel is not None:
                            oux = obs_vel[0][oc[q]]
                            ouy = obs_vel[1][oc[q]]
                            vel_tgt[0] += (t * ux + oux) / (t + 1.0)
                            vel_tgt[1] += (t * uy + ouy) / (t + 1.0)
                            rho_tgt += 6.0 * W[q] * (E[qi, 0] * oux + E[qi, 1] * ouy)
                        else:
                            vel_tgt[0] += t * ux / (t + 1.0)
                            vel_tgt[1] += t * uy / (t + 1.0)
                rho_tgt += f[qi, y, x]
            if cnt == 0:
                continue
            vel_tgt /= cnt

            gu = np.zeros((2, 2))
            for comp in range(2):
                a = vel[comp]
                gu[comp][0] = (
                    4 * a[oc[1]] - 4 * a[oc[3]] + a[oc[5]] - a[oc[6]] + a[oc[8]] - a[oc[7]]
                ) / 12.0
                gu[comp][1] = (
                    4 * a[oc[2]] - 4 * a[oc[4]] + a[oc[5]] - a[oc[8]] + a[oc[6]] - a[oc[7]]
                ) / 12.0

            for q in range(9):
                if not is_obs[q]:
                    continue
                qi = REFL[q]
                e0, e1 = E[qi, 0], E[qi, 1]
                pab = (rho_tgt * vel_tgt[0] ** 2 - rho_tgt * cs2 * tau * (gu[0][0] * 2)) * (
                    e0 * e0 - cs2
                )
                pab += (
                    rho_tgt * vel_tgt[1] * vel_tgt[0]
                    - rho_tgt * cs2 * tau * (gu[1][0] + gu[0][1])
                ) * (e1 * e0)
                pab += (
                    rho_tgt * vel_tgt[0] * vel_tgt[1]
                    - rho_tgt * cs2 * tau * (gu[0][1] + gu[1][0])
                ) * (e0 * e1)
                pab += (rho_tgt * vel_tgt[1] ** 2 - rho_tgt * cs2 * tau * (gu[1][1] * 2)) * (
                    e1 * e1 - cs2
                )
                f_new[qi, y, x] = W[qi] * (
                    rho_tgt
                    + rho_tgt * c / cs2 * (vel_tgt[0] * e0 + vel_tgt[1] * e1)
                    + 0.5 * pab / cs2 / cs2
                )
    return f_new


def _feq_point_shifted(rho, ux, uy, fx=0.0, fy=0.0):
    """feq with the Guo half-force velocity shift (LBM_collision_2d.py:249-252)."""
    eps = 1e-10
    if rho > eps:
        ux = ux + 0.5 * fx / rho
        uy = uy + 0.5 * fy / rho
    return _feq_point(rho, ux, uy)


def macro_oracle(f, rho, vel, flags):
    """Sequential port of the live macro path (LBM_macro_compute_2d.py:316-336):
    rho = sum_q f, u = sum_q f e_q / rho, OBSTACLE passthrough."""
    f = np.asarray(f, dtype=np.float64)
    _, H, Wd = f.shape
    rho_new = np.array(rho, dtype=np.float64)
    vel_new = np.array(vel, dtype=np.float64)
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OBSTACLE:
                continue
            r = 0.0
            mx = 0.0
            my = 0.0
            for q in range(9):
                r += f[q, y, x]
                mx += f[q, y, x] * E[q, 0]
                my += f[q, y, x] * E[q, 1]
            rho_new[y, x] = r
            safe = r if r != 0.0 else 1.0
            vel_new[0, y, x] = mx / safe
            vel_new[1, y, x] = my / safe
    return rho_new, vel_new


def macro_C_oracle(h, C, flags):
    """C = sum_q h with OBSTACLE passthrough (LBM_macro_compute_2d.py:273-295)."""
    h = np.asarray(h, dtype=np.float64)
    _, H, Wd = h.shape
    C_new = np.array(C, dtype=np.float64)
    for y in range(H):
        for x in range(Wd):
            if flags[y, x] != OBSTACLE:
                C_new[y, x] = h[:, y, x].sum()
    return C_new


def collision_oracle(
    f,
    rho,
    vel,
    flags,
    tau,
    force=None,
    mesh=None,
    is_convection=False,
    axisymmetric_type=0,
    dx=1.0,
    dt=1.0,
):
    """Sequential port of the live BGK + axisymmetric-Gi collision
    (LBM_collision_2d.py:343-555, LINE_X_EQ_0 branches — the only axis
    any demo uses). Stencil fields come from grad_oracle/div_oracle; the
    per-cell relaxation and source arithmetic is replicated literally,
    including the per-direction convection rate w_q = 1/tau +
    dt (1 - 0.5/tau) e_r / r (:513-529) and the OBSTACLE passthrough."""
    f = np.asarray(f, dtype=np.float64)
    rho = np.asarray(rho, dtype=np.float64)
    vel = np.asarray(vel, dtype=np.float64)
    _, H, Wd = f.shape
    c = dx / dt
    cs2 = c * c / 3.0
    ax = int(axisymmetric_type)
    assert ax in (0, 1), "oracle covers the live LINE_X_EQ_0 / off paths"
    f_new = f.copy()

    if ax == 1 and not is_convection:
        # whole-field stencil inputs of the G source (:389-414)
        r_field = mesh[0]
        ur = vel[0]
        A1_f = -rho * ur / r_field
        grad_u = grad_oracle(vel[0], flags, dx=dx, axisymmetric_type=ax)
        grad_v = grad_oracle(vel[1], flags, dx=dx, axisymmetric_type=ax)
        grad_p = grad_oracle(rho * cs2, flags, dx=dx, axisymmetric_type=ax)
        div_m = div_oracle(rho * ur * vel, flags, dx=dx, axisymmetric_type=ax)
        grad_A1 = grad_oracle(A1_f, flags, dx=dx, axisymmetric_type=ax)

    for y in range(H):
        for x in range(Wd):
            if flags[y, x] == OBSTACLE:
                continue
            rr = rho[y, x]
            ux, uy = vel[0, y, x], vel[1, y, x]
            if force is not None:
                fq = _feq_point_shifted(rr, ux, uy, force[0, y, x], force[1, y, x])
            else:
                fq = _feq_point(rr, ux, uy)

            if ax == 1:
                r = mesh[0][y, x]
                if is_convection:
                    for q in range(9):
                        s = dt * (1.0 - 0.5 / tau) * E[q, 0] / r
                        w_rate = 1.0 / tau + s
                        Gi = -(ux / r) * fq[q] * (1.0 - 0.5 / tau - 0.5 * s)
                        f_new[q, y, x] = (
                            f[q, y, x]
                            + w_rate * (fq[q] - f[q, y, x])
                            + dt * Gi
                        )
                else:
                    visc = cs2 * (tau - 0.5)
                    mu = visc * rr
                    A1 = A1_f[y, x]
                    A2 = (grad_p[0, y, x] + div_m[y, x]) * (dt / (2.0 * r))
                    F2x = (
                        (mu / r) * (grad_u[0, y, x] - ux / r)
                        + ux * A1
                        - dt * (tau - 1.0) * cs2 * grad_A1[0, y, x]
                    )
                    F2y = (
                        (mu / r) * grad_v[0, y, x]
                        + uy * A1
                        - dt * (tau - 1.0) * cs2 * grad_A1[1, y, x]
                    )
                    for q in range(9):
                        G = (
                            A1
                            + A2
                            + (E[q, 0] * F2x + E[q, 1] * F2y) / cs2
                        ) * W[q]
                        f_new[q, y, x] = (
                            f[q, y, x]
                            + (1.0 / tau) * (fq[q] - f[q, y, x])
                            + dt * G
                        )
            else:
                for q in range(9):
                    f_new[q, y, x] = f[q, y, x] + (1.0 / tau) * (
                        fq[q] - f[q, y, x]
                    )
    return f_new
