from icicle_tpu.polynomials.polynomial import Polynomial

__all__ = ["Polynomial"]
