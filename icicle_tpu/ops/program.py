"""Program / Symbol: user-defined elementwise field computations.

Reference F10: include/icicle/program/{symbol.h, program.h,
returning_value_program.h} — a Symbol DFG captured from a user lambda,
compiled into u32 bytecode (op | in1<<8 | in2<<16 | out<<24) and interpreted
by backends (backend/cpu/include/cpu_program_executor.h).

TPU redesign: the DFG traces straight to a JAX-jittable function — JAX *is*
the program abstraction — so `execute` vectorizes over any batch of field
tensors with zero interpretation overhead. The bytecode encoder is kept for
FFI/test parity with the reference's instruction format, and poly_degree
tracking mirrors ReturningValueProgram (sumcheck needs the combine degree).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable

from icicle_tpu.fields.field import Field


class Opcode(enum.IntEnum):
    # mirrors ProgramOpcode (symbol.h:12-23)
    COPY = 0
    ADD = 1
    MULT = 2
    SUB = 3
    INV = 4
    NOF_OPERATIONS = 5
    INPUT = 6
    CONST = 7


class PreDefined(enum.IntEnum):
    # mirrors PreDefinedPrograms (program.h:13-16)
    AB_MINUS_C = 0
    EQ_X_AB_MINUS_C = 1


@dataclasses.dataclass(frozen=True)
class _Node:
    opcode: Opcode
    a: "_Node | None" = None
    b: "_Node | None" = None
    const_val: int | None = None
    input_idx: int | None = None
    poly_degree: int = 0


class Symbol:
    """Operator-overloaded DFG builder (reference Symbol<S>)."""

    def __init__(self, node: _Node):
        self._node = node

    @staticmethod
    def input(idx: int) -> "Symbol":
        return Symbol(_Node(Opcode.INPUT, input_idx=idx, poly_degree=1))

    @staticmethod
    def constant(value: int) -> "Symbol":
        return Symbol(_Node(Opcode.CONST, const_val=value, poly_degree=0))

    def _coerce(self, other) -> "Symbol":
        if isinstance(other, Symbol):
            return other
        return Symbol.constant(int(other))

    def __add__(self, other):
        o = self._coerce(other)
        return Symbol(_Node(Opcode.ADD, self._node, o._node,
                            poly_degree=max(self._node.poly_degree,
                                            o._node.poly_degree)))

    __radd__ = __add__

    def __sub__(self, other):
        o = self._coerce(other)
        return Symbol(_Node(Opcode.SUB, self._node, o._node,
                            poly_degree=max(self._node.poly_degree,
                                            o._node.poly_degree)))

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __mul__(self, other):
        o = self._coerce(other)
        return Symbol(_Node(Opcode.MULT, self._node, o._node,
                            poly_degree=self._node.poly_degree
                            + o._node.poly_degree))

    __rmul__ = __mul__

    def inverse(self):
        # reference sets degree of inverse to -1 "unknown" via update rules;
        # keep the operand degree (inverse is non-polynomial) and flag it.
        return Symbol(_Node(Opcode.INV, self._node,
                            poly_degree=self._node.poly_degree))


class Program:
    """Executable program over field element tensors.

    Create from a lambda over Symbols (like the reference's
    Program(std::function, nof_parameters)): the lambda receives a list of
    `nof_parameters` Symbols; entries it overwrites become outputs. Or pass a
    PreDefined.
    """

    def __init__(self, func_or_predef, nof_parameters: int | None = None):
        if isinstance(func_or_predef, PreDefined):
            pre = func_or_predef
            if pre == PreDefined.AB_MINUS_C:
                self.nof_parameters = 4
                func = self._ab_minus_c
            else:
                self.nof_parameters = 5
                func = self._eq_x_ab_minus_c
            self.predef = pre
        else:
            assert nof_parameters is not None
            self.nof_parameters = nof_parameters
            func = func_or_predef
            self.predef = None

        params = [Symbol.input(i) for i in range(self.nof_parameters)]
        originals = list(params)
        func(params)
        # outputs = entries replaced by the lambda (reference
        # Program::generate_program marks output symbols)
        self.outputs = [s._node for s, o in zip(params, originals)
                        if s is not o]
        if not self.outputs:
            raise ValueError("program lambda must assign at least one output")
        self.poly_degree = max(n.poly_degree for n in self.outputs)

    # predefined lambdas (program.h:13-16: results overwrite the LAST slots)
    @staticmethod
    def _ab_minus_c(v):
        v[3] = v[0] * v[1] - v[2]

    @staticmethod
    def _eq_x_ab_minus_c(v):
        v[4] = v[3] * (v[0] * v[1] - v[2])

    # -- execution ------------------------------------------------------------------
    def execute(self, f: Field, inputs: list):
        """Evaluate outputs given `nof_inputs` field tensors (broadcastable).

        Returns a list of output tensors (most programs have one).
        """
        cache: dict[int, object] = {}

        def ev(n: _Node):
            key = id(n)
            if key in cache:
                return cache[key]
            if n.opcode == Opcode.INPUT:
                v = inputs[n.input_idx]
            elif n.opcode == Opcode.CONST:
                v = f.from_ints([n.const_val % f.modulus])[0]
            elif n.opcode == Opcode.ADD:
                v = f.add(ev(n.a), ev(n.b))
            elif n.opcode == Opcode.SUB:
                v = f.sub(ev(n.a), ev(n.b))
            elif n.opcode == Opcode.MULT:
                v = f.mul(ev(n.a), ev(n.b))
            elif n.opcode == Opcode.INV:
                v = f.inv(ev(n.a))
            elif n.opcode == Opcode.COPY:
                v = ev(n.a)
            else:
                raise ValueError(n.opcode)
            cache[key] = v
            return v

        return [ev(n) for n in self.outputs]

    # -- bytecode (FFI parity with program.h instruction format) --------------------
    def to_bytecode(self) -> list[int]:
        """Encode as u32 instructions: op | in1<<8 | in2<<16 | out<<24.

        Register file layout mirrors the reference executor: slots [0,
        nof_parameters) are the parameters; temporaries are appended after.
        """
        if self.predef is not None:
            return [int(Opcode.NOF_OPERATIONS) + int(self.predef)]
        instrs: list[int] = []
        slot_of: dict[int, int] = {}
        next_slot = self.nof_parameters
        consts: list[int] = []

        def emit(n: _Node) -> int:
            nonlocal next_slot
            key = id(n)
            if key in slot_of:
                return slot_of[key]
            if n.opcode == Opcode.INPUT:
                slot_of[key] = n.input_idx
                return n.input_idx
            if n.opcode == Opcode.CONST:
                slot = next_slot
                next_slot += 1
                consts.append(n.const_val)
                slot_of[key] = slot
                return slot
            a = emit(n.a)
            b = emit(n.b) if n.b is not None else 0
            slot = next_slot
            next_slot += 1
            instrs.append(int(n.opcode) | (a << 8) | (b << 16) | (slot << 24))
            slot_of[key] = slot
            return slot

        for out in self.outputs:
            emit(out)
        self.constants = consts
        return instrs


class ReturningValueProgram(Program):
    """Single-output program built from a value-returning lambda
    (reference returning_value_program.h) — sumcheck combine functions."""

    def __init__(self, func_or_predef, nof_inputs: int | None = None):
        if isinstance(func_or_predef, PreDefined):
            super().__init__(func_or_predef)
            self.nof_inputs = self.nof_parameters - 1
            return
        assert nof_inputs is not None
        self.nof_inputs = nof_inputs

        def wrapper(v):
            v[nof_inputs] = func_or_predef(v[:nof_inputs])

        super().__init__(wrapper, nof_inputs + 1)

    def execute_one(self, f: Field, inputs: list):
        return self.execute(f, inputs)[0]
