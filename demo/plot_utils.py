"""Record/overlay file readers shared by the plot scripts.

Ports the whitespace parsers of `demo_plot_{validation,water,Pe,
similarity}.py`; overlay files (experiments/, NF/, PF/) are user-supplied
data not shipped with the reference repo, so their absence is tolerated.
"""

from __future__ import annotations

import os

import numpy as np


def read_record(path: str):
    """Read a record_res*_Re*_Pe*.txt: returns (x, inflow, current, u, v).

    Format: header 'Step Inflow Current u, v', then whitespace rows
    (`C_ethaline:283-286,406-416`).
    """
    xs, inflows, currents, us, vs = [], [], [], [], []
    with open(path) as fo:
        fo.readline()
        for line in fo:
            parts = line.strip().split(" ")
            if len(parts) < 3 or not parts[0]:
                break
            xs.append(float(parts[0]))
            inflows.append(float(parts[1]))
            currents.append(float(parts[2]))
            if len(parts) >= 5:
                us.append(float(parts[3]))
                vs.append(float(parts[4]))
    return (
        np.asarray(xs), np.asarray(inflows), np.asarray(currents),
        np.asarray(us), np.asarray(vs),
    )


def find_record(dir_path: str, Re: float, Pe: float):
    """Locate the record file for (Re, Pe); port of
    `demo_plot_validation.py:29-40`, with the substring match anchored
    on the `_Re.._Pe...txt` delimiters (the reference's bare `in` test
    lets `Pe10` match a `Pe100.txt` file, silently plotting the wrong
    case when both exist — a deliberate quirk fix, docs/PARITY.md)."""
    if not os.path.isdir(dir_path):
        return None
    for fn in os.listdir(dir_path):
        if f"_Re{Re}_" in fn and fn.endswith(f"_Pe{int(Pe * 10000)}.txt"):
            return os.path.join(dir_path, fn)
    return None


def load_approach_curve(path: str, is_negative: bool = True,
                        norm_index: int = 10):
    """x (tip distance / 12.5) and plateau-normalized current, flipped —
    the reference's normalization (`demo_plot_validation.py:46-62`)."""
    xs, _, currents, _, _ = read_record(path)
    xs = xs[:-1] / 12.5
    cur = np.flip(currents[:-1])
    p0 = 30 if is_negative else 60
    denom = np.mean(cur[p0 : p0 + norm_index])
    if denom != 0:
        cur = cur / denom
    return xs, cur


def read_two_column(path: str, sep: str):
    """Experiment/theory overlay file: header line + two columns."""
    xs, ys = [], []
    with open(path) as fo:
        fo.readline()
        for line in fo:
            parts = line.strip().split(sep)
            if len(parts) < 2 or not parts[0]:
                break
            xs.append(float(parts[0]))
            ys.append(float(parts[1]))
    return np.asarray(xs, np.float32), np.asarray(ys, np.float32)
