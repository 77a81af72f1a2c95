"""Draw — residual line graphs (-ksp_monitor_draw analog).

Reference: src/sys/classes/draw (X11/OpenGL/TikZ line graphs fed by
KSPMonitorLG). Headless TPU pods have no X11; the equivalents here are
an ASCII line graph rendered to the terminal and an optional
matplotlib PNG — both consuming the residual history that every
SolveResult already carries (the while_loop records it on device, so
"drawing" is pure post-processing).
"""

from __future__ import annotations

import math

import numpy as np


def _finite_history(history) -> np.ndarray:
    h = np.asarray(history, float)
    return h[np.isfinite(h)]


def ascii_lg(history, width: int = 60, height: int = 16,
             title: str = "Residual norm (log10)") -> str:
    """Render a log-scale line graph of a residual history as text."""
    h = _finite_history(history)
    if h.size == 0:
        return "(no residual history)"
    h = np.maximum(h, 1e-300)
    logs = np.log10(h)
    lo, hi = float(logs.min()), float(logs.max())
    if hi - lo < 1e-12:
        hi = lo + 1.0
    cols = np.linspace(0, len(logs) - 1, min(width, len(logs))).astype(int)
    vals = logs[cols]
    rows = []
    for r in range(height):
        level = hi - (r / (height - 1)) * (hi - lo)
        line = []
        for v in vals:
            line.append("*" if abs(v - level) <= (hi - lo) / (2 * (height - 1))
                        else ("." if v > level else " "))
        label = f"{level:6.1f} |"
        rows.append(label + "".join(line))
    footer = " " * 8 + "0" + " " * (len(cols) - 2) + str(len(logs) - 1)
    return "\n".join([title] + rows + [footer,
                     f"  its={len(h) - 1}  r0={h[0]:.3e}  "
                     f"r={h[-1]:.3e}"])


def save_lg_png(history, path: str, title: str = "KSP residual") -> bool:
    """Write a matplotlib semilogy of the history; returns False when
    matplotlib is unavailable (gated dependency)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    h = _finite_history(history)
    if h.size == 0:
        return False
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogy(np.arange(len(h)), np.maximum(h, 1e-300), "o-", ms=3)
    ax.set_xlabel("iteration")
    ax.set_ylabel("residual norm")
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return True


def monitor_draw(result, save: str = None, echo: bool = True) -> str:
    """KSPMonitorLG analog driven from a SolveResult/SNESResult."""
    txt = ascii_lg(result.history)
    if echo:
        print(txt)
    if save:
        save_lg_png(result.history, save)
    return txt
