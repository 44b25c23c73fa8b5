"""Polynomial API tour (mirrors reference examples/c++/polynomial-api and
polynomial-multiplication): arithmetic, NTT-based multiplication, division,
vanishing-polynomial division, evaluation forms, slicing.

Run: python examples/polynomial_example.py
"""

import numpy as np

from icicle_tpu.fields.field import get_field
from icicle_tpu.polynomials.polynomial import Polynomial

f = get_field("babybear")
rng = np.random.default_rng(0)

# --- construct from coefficients and from evaluations -----------------------
a = Polynomial.from_coeffs(f, f.from_ints([1, 2, 3, 4]))          # 1+2x+3x^2+4x^3
evals = a.eval_on_rou_domain(3)                                    # 8-point eval form
b = Polynomial.from_rou_evals(f, evals, size=8)
assert np.array_equal(a.to_ints()[:4], b.to_ints()[:4])
print("coeff <-> rou-eval roundtrip OK")

# --- arithmetic + NTT multiplication ----------------------------------------
c = (a + b) * a - b.mul_scalar(f.from_ints([5]))
print("degree((a+b)*a - 5b) =", c.degree())

# --- division: (a*b) / a == b ------------------------------------------------
q, r = (a * b).divide(a)
assert r.degree() <= 0 and int(r.to_ints()[0]) == 0
assert np.array_equal(q.to_ints()[: b.degree() + 1],
                      b.to_ints()[: b.degree() + 1])
print("euclidean division OK")

# --- divide by vanishing polynomial x^4 - 1 ----------------------------------
# p(x) = (x^4 - 1) * a(x)  =>  p / Z_4 == a
shifted = Polynomial.from_coeffs(f, f.from_ints([0, 0, 0, 0, 1, 2, 3, 4]))
prod = shifted - a            # x^4*a - a = (x^4 - 1)*a
quot = prod.divide_by_vanishing(4)
assert np.array_equal(quot.to_ints()[:4], a.to_ints()[:4])
print("divide_by_vanishing OK")

# --- monomial updates, slicing, evaluation ------------------------------------
d = a.clone().add_monomial_inplace(f.from_ints([7]), 5)   # +7x^5
assert int(d.get_coeff(5)) == 7
ev = d.even()
od = d.odd()
x0 = f.from_ints([3])
lhs = int(f.to_ints(d.eval(x0)[None])[0])
x2 = f.mul(x0, x0)
rhs = int(f.to_ints(
    f.add(ev.eval(x2), f.mul(x0, od.eval(x2)))[None])[0])
assert lhs == rhs, "d(x) == even(x^2) + x*odd(x^2)"
print("even/odd split + eval OK")
