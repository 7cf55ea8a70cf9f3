"""FFT-size planning (trace time).

The reference grows every transform axis to the nearest size that is a
multiple of 32 and {2,3,5}-smooth above that (``Utils.hpp:141-157``, a rule
inherited from pffft's real-transform constraints), covering the growth with
trailing zeros (``README.md:58``). On TPU, XLA's FFT strongly prefers
power-of-two lengths, so the planner also offers a ``pow2`` mode; the math is
unchanged (the growth region is provably never read by interior outputs —
the kernel reach from any cropped output pixel stays inside the reflected
pad).
"""

from __future__ import annotations

__all__ = [
    "is_valid_size",
    "nearest_transform_size",
    "next_pow2",
    "plan_fft_size",
    "SIZE_MODES",
]

_N_MIN = 32

SIZE_MODES = ("auto", "smooth235", "pow2")

# ``auto``: above this length a TPU backend plans pow2 instead of smooth235.
# XLA's TPU FFT both compiles and runs far better on power-of-two lengths;
# smooth235 at 14 MP+ frames measured multi-minute compiles (STATUS.md round
# 1 known limitations). Below the threshold the two modes compile in the
# same ballpark and smooth235 pads less, so reference behavior is kept.
_AUTO_POW2_THRESHOLD = 2048


def is_valid_size(n: int) -> bool:
    """True iff ``n`` reduces to 32 by dividing out 5s, then 3s, then 2s.

    Reference ``Utils.hpp:141-148`` (pffft's legality check for real
    transforms; also a fast size for pocketfft).
    """
    r = n
    while r >= 5 * _N_MIN and r % 5 == 0:
        r //= 5
    while r >= 3 * _N_MIN and r % 3 == 0:
        r //= 3
    while r >= 2 * _N_MIN and r % 2 == 0:
        r //= 2
    return r == _N_MIN


def nearest_transform_size(n: int) -> int:
    """Smallest valid size >= n, stepping in multiples of 32.

    Reference ``Utils.hpp:150-157``.
    """
    if n < _N_MIN:
        n = _N_MIN
    n = _N_MIN * ((n + _N_MIN - 1) // _N_MIN)
    while not is_valid_size(n):
        n += _N_MIN
    return n


def next_pow2(n: int) -> int:
    """Smallest power of two >= max(n, 32)."""
    n = max(int(n), _N_MIN)
    return 1 << (n - 1).bit_length()


def _backend_is_tpu() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def plan_fft_size(n: int, mode: str = "auto") -> int:
    """Legal transform length >= n for the given planner mode.

    ``smooth235`` reproduces the reference's padding policy exactly;
    ``pow2`` trades extra trailing zeros for TPU FFT speed; ``auto`` (the
    default) is smooth235 except on a TPU backend above
    ``_AUTO_POW2_THRESHOLD``, where smooth235's non-pow2 XLA FFTs hit
    multi-minute compiles — explicit ``smooth235`` remains the parity mode.
    """
    if mode == "auto":
        mode = (
            "pow2"
            if n > _AUTO_POW2_THRESHOLD and _backend_is_tpu()
            else "smooth235"
        )
    if mode == "smooth235":
        return n if is_valid_size(n) else nearest_transform_size(n)
    if mode == "pow2":
        return next_pow2(n)
    raise ValueError(f"unknown FFT size mode {mode!r}; expected one of {SIZE_MODES}")
