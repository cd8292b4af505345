"""Signal padding kernels.

Semantics match /root/reference/SignalSharp/Common/SignalPadding.cs:43-133.
Pads half_window = window_size // 2 points on EACH side.

Mode map (verified against the reference loops):
  constant -> np.pad mode="constant"
  mirror   -> np.pad mode="symmetric"  (edge value repeated)
  nearest  -> np.pad mode="edge"
  periodic -> left pad is np "wrap" ([x[n-hw:]]) but the RIGHT pad is the
              REVERSED first half-window ([x[hw-1], ..., x[0]]) — a quirk of
              the reference's loop (SignalPadding.cs:126-133) that we replicate
              exactly instead of using np.pad mode="wrap".
"""

from __future__ import annotations

import numpy as np

PAD_NONE = "none"
PAD_CONSTANT = "constant"
PAD_MIRROR = "mirror"
PAD_NEAREST = "nearest"
PAD_PERIODIC = "periodic"

_MODES = (PAD_NONE, PAD_CONSTANT, PAD_MIRROR, PAD_NEAREST, PAD_PERIODIC)


def apply_padding(
    signal: np.ndarray,
    window_size: int,
    padding: str,
    padded_value: float = 0.0,
) -> np.ndarray:
    if padding not in _MODES:
        raise ValueError(f"Unknown padding mode {padding!r}; expected one of {_MODES}")
    signal = np.asarray(signal, dtype=np.float64)
    if padding == PAD_NONE:
        return signal
    hw = window_size // 2
    if hw == 0:
        return signal.copy()
    n = signal.size
    if padding == PAD_CONSTANT:
        return np.pad(signal, hw, mode="constant", constant_values=padded_value)
    if padding == PAD_MIRROR:
        return np.pad(signal, hw, mode="symmetric")
    if padding == PAD_NEAREST:
        return np.pad(signal, hw, mode="edge")
    # periodic (reference quirk on the right side)
    out = np.empty(n + 2 * hw, dtype=np.float64)
    out[hw : hw + n] = signal
    out[:hw] = signal[n - hw :]
    out[hw + n :] = signal[:hw][::-1]
    return out


def trim_padding(extended: np.ndarray, original_length: int, window_size: int) -> np.ndarray:
    hw = window_size // 2
    return np.asarray(extended, dtype=np.float64)[hw : hw + original_length].copy()
