"""Sumcheck example (mirrors reference examples/c++/sumcheck): prove that
sum over the boolean hypercube of a*b - c equals the claimed value.
Run: PYTHONPATH=.:/root/.axon_site python examples/sumcheck_example.py
"""

import numpy as np

from icicle_tpu.fields.field import get_field
from icicle_tpu.ops.program import ReturningValueProgram, PreDefined
from icicle_tpu.ops.sumcheck import (
    sumcheck_prove, sumcheck_verify, SumcheckTranscriptConfig,
)


def main():
    f = get_field("babybear")
    P = f.modulus
    rng = np.random.default_rng(1)
    n = 256
    a = [int(v) for v in rng.integers(0, P, size=n)]
    b = [int(v) for v in rng.integers(0, P, size=n)]
    c = [int(v) for v in rng.integers(0, P, size=n)]
    claimed = sum(x * y - z for x, y, z in zip(a, b, c)) % P
    print(f"claimed sum over 2^{n.bit_length()-1} hypercube:", claimed)

    prog = ReturningValueProgram(PreDefined.AB_MINUS_C)
    tcfg = SumcheckTranscriptConfig(domain_separator_label=b"example")
    proof, challenges = sumcheck_prove(
        f, [f.from_ints(a), f.from_ints(b), f.from_ints(c)], claimed, prog, tcfg)
    print(f"proof: {len(proof.round_polys)} round polynomials, "
          f"blob = {len(proof.serialize(f))} bytes")
    assert sumcheck_verify(f, proof, claimed, tcfg)
    print("verify: OK")
    assert not sumcheck_verify(f, proof, (claimed + 1) % P, tcfg)
    print("wrong claim rejected: OK")


if __name__ == "__main__":
    main()
