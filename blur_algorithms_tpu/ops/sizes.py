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

# ``auto``: on a TPU backend plan pow2 at EVERY length. XLA's TPU FFT
# compile time on non-pow2 lengths is a lottery even for small multiple-
# of-32 {2,3,5}-smooth sizes: measured rfft2+irfft2 first-call times
# (v5e) — (320, 480) >3 min and 490 s inside a full program, while
# (360, 450) takes 6.3 s and any pow2 ~3 s. A default that sometimes
# hangs the first call for minutes is unacceptable; explicit
# ``smooth235`` remains the reference-parity mode (identical results —
# padding growth is provably never read by interior outputs).


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
    default) is pow2 on a TPU backend — XLA's non-pow2 TPU FFT compiles
    are a multi-minute lottery even at small sizes (see the note above) —
    and smooth235 elsewhere (CPU compiles are fast at any smooth size).
    """
    if mode == "auto":
        mode = "pow2" if _backend_is_tpu() else "smooth235"
    if mode == "smooth235":
        return n if is_valid_size(n) else nearest_transform_size(n)
    if mode == "pow2":
        return next_pow2(n)
    raise ValueError(f"unknown FFT size mode {mode!r}; expected one of {SIZE_MODES}")
