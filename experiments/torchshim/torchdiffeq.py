"""Minimal ``torchdiffeq.odeint`` stand-in backed by scipy's RK45.

The torch reference's KF datagen calls ``odeint(rhs, u0, t, method='dopri5')``
(/root/reference/generate/generate_data.py:18,518); torchdiffeq is not
installed in this container.  scipy's ``RK45`` *is* the Dormand–Prince 5(4)
embedded pair — the same method dopri5 implements — so solving the identical
semi-discrete system at torchdiffeq's default tolerances (rtol=1e-7,
atol=1e-9) reproduces the reference's data distribution; only step-size
controller details differ, far below the data's 1e-7 tolerance.

Pure shim: the reference code runs unmodified; the torch RHS is evaluated
under ``no_grad`` on numpy-roundtripped state.
"""
import numpy as np
import torch
from scipy.integrate import solve_ivp


def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method=None, options=None):
    shape = tuple(y0.shape)
    dtype = y0.dtype
    t_np = np.asarray(t.detach().cpu(), dtype=np.float64)

    def f(ti, yi):
        yt = torch.as_tensor(yi.reshape(shape), dtype=dtype)
        with torch.no_grad():
            dy = func(torch.tensor(ti, dtype=dtype), yt)
        return np.asarray(dy.detach().cpu(), dtype=np.float64).ravel()

    sol = solve_ivp(
        f, (float(t_np[0]), float(t_np[-1])),
        np.asarray(y0.detach().cpu(), dtype=np.float64).ravel(),
        method="RK45", t_eval=t_np, rtol=rtol, atol=atol,
    )
    if not sol.success:
        raise RuntimeError(f"odeint shim: solve_ivp failed: {sol.message}")
    return torch.as_tensor(
        sol.y.T.reshape((len(t_np),) + shape), dtype=dtype
    )
