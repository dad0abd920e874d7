from .complexsql import magnitude, phase, power
from .coords import fft_coord, linear_coord, rfft_coord

__all__ = ["fft_coord", "rfft_coord", "linear_coord", "magnitude", "phase", "power"]
