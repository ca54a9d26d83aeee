"""Metric-formula parser + symbolic differentiation.

The reference expresses ratio/composite metrics as small arithmetic formulas
over per-group means — e.g. ``avg(numerator)/avg(denominator)`` — and its
engine UDAFs differentiate those formulas to apply the delta method
(grammar: ``+ - * / ^``, numbers, slots; see reference
``src/udf/starrocks/be/src/exprs/helpers/expr_tree.hpp:187-307``).

This module is a fresh implementation with one twist that makes it Spark-first:
AST nodes evaluate against *any* arithmetic environment, so the same tree
renders either to Python floats (driver-side finalizers) or to
``pyspark.sql.Column`` expressions (fully-distributed, codegen-friendly
closed-form statistics). Differentiation is exact symbolic autodiff over the
four operators plus power.

``parse_formula("avg(x1)/avg(x2)")`` returns ``(node, base_exprs)`` where
``base_exprs`` are the distinct inner SQL expressions (``x1``, ``x2``) and the
node's symbols index into that list. Bare identifiers are accepted as sugar:
``x1/x2`` ≡ ``avg(x1)/avg(x2)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


def _is_column(v) -> bool:
    try:
        from pyspark.sql import Column
    except ImportError:          # driver-math-only use of the module
        return False
    return isinstance(v, Column)


class Node:
    """Arithmetic expression over mean-slots ``Sym(i)``."""

    def value(self, env):
        raise NotImplementedError

    def deriv(self, i: int) -> "Node":
        raise NotImplementedError

    def symbols(self) -> set:
        raise NotImplementedError

    # -- convenience ----------------------------------------------------
    def gradient(self, n_syms: int) -> list["Node"]:
        return [simplify(self.deriv(i)) for i in range(n_syms)]


@dataclass(frozen=True)
class Const(Node):
    v: float

    def value(self, env):
        return self.v

    def deriv(self, i):
        return Const(0.0)

    def symbols(self):
        return set()


@dataclass(frozen=True)
class Sym(Node):
    i: int

    def value(self, env):
        return env[self.i]

    def deriv(self, i):
        return Const(1.0) if i == self.i else Const(0.0)

    def symbols(self):
        return {self.i}


@dataclass(frozen=True)
class Neg(Node):
    a: Node

    def value(self, env):
        return -self.a.value(env)

    def deriv(self, i):
        return Neg(self.a.deriv(i))

    def symbols(self):
        return self.a.symbols()


@dataclass(frozen=True)
class BinOp(Node):
    op: str
    a: Node
    b: Node

    def value(self, env):
        x, y = self.a.value(env), self.b.value(env)
        if self.op == "+":
            return x + y
        if self.op == "-":
            return x - y
        if self.op == "*":
            return x * y
        if self.op == "/":
            if _is_column(x) or _is_column(y):
                # ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO on a
                # bare Column `/`; a zero-denominator group must yield NULL.
                # try_divide accepts only Column/str — wrap the constant
                # side (e.g. 'avg(x)/2', a Const gradient) in lit()
                from pyspark.sql import functions as F

                if not _is_column(x):
                    x = F.lit(float(x))
                if not _is_column(y):
                    y = F.lit(float(y))
                return F.try_divide(x, y)
            return x / y
        if self.op == "^":
            return x ** y
        raise ValueError(self.op)

    def deriv(self, i):
        a, b, da, db = self.a, self.b, self.a.deriv(i), self.b.deriv(i)
        if self.op == "+":
            return BinOp("+", da, db)
        if self.op == "-":
            return BinOp("-", da, db)
        if self.op == "*":
            return BinOp("+", BinOp("*", da, b), BinOp("*", a, db))
        if self.op == "/":
            # (da*b - a*db) / b^2
            num = BinOp("-", BinOp("*", da, b), BinOp("*", a, db))
            return BinOp("/", num, BinOp("*", b, b))
        if self.op == "^":
            if not isinstance(b, Const):
                raise ValueError("power exponent must be a constant")
            # d(a^c) = c * a^(c-1) * da
            return BinOp("*", BinOp("*", b, BinOp("^", a, Const(b.v - 1))), da)
        raise ValueError(self.op)

    def symbols(self):
        return self.a.symbols() | self.b.symbols()


def simplify(n: Node) -> Node:
    """Constant folding + algebraic identities; keeps Column trees small."""
    if isinstance(n, Neg):
        a = simplify(n.a)
        if isinstance(a, Const):
            return Const(-a.v)
        return Neg(a)
    if not isinstance(n, BinOp):
        return n
    a, b = simplify(n.a), simplify(n.b)
    if isinstance(a, Const) and isinstance(b, Const):
        return Const(BinOp(n.op, a, b).value([]))
    if n.op == "+":
        if isinstance(a, Const) and a.v == 0:
            return b
        if isinstance(b, Const) and b.v == 0:
            return a
    elif n.op == "-":
        if isinstance(b, Const) and b.v == 0:
            return a
        if isinstance(a, Const) and a.v == 0:
            return Neg(b)
    elif n.op == "*":
        for x, y in ((a, b), (b, a)):
            if isinstance(x, Const):
                if x.v == 0:
                    return Const(0.0)
                if x.v == 1:
                    return y
    elif n.op == "/":
        if isinstance(a, Const) and a.v == 0:
            return Const(0.0)
        if isinstance(b, Const) and b.v == 1:
            return a
    elif n.op == "^":
        if isinstance(b, Const):
            if b.v == 1:
                return a
            if b.v == 0:
                return Const(1.0)
    return BinOp(n.op, a, b)


_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<id>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>[-+*/^()]))"
)

_AGG_FNS = {"avg", "mean"}


class _Parser:
    """Recursive-descent: expr := term (+|- term)*; term := factor (*|/ factor)*;
    factor := unary (^ unary)?; unary := [-+] unary | atom;
    atom := number | avg( inner ) | identifier | ( expr )."""

    def __init__(self, text: str, slots: dict[str, int]):
        self.text = text
        self.pos = 0
        self.slots = slots  # inner-expr string -> symbol index (shared across formulas)

    def _peek(self):
        # skip whitespace here so a trailing/stray space is end-of-input
        # instead of a 'bad token' (formulas pasted from configs/UIs
        # routinely carry one)
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1
        if self.pos >= len(self.text):
            return None, None
        m = _TOKEN.match(self.text, self.pos)
        if not m:
            raise ValueError(f"bad token at {self.text[self.pos:]!r}")
        kind = m.lastgroup
        return m, kind

    def _next(self):
        m, kind = self._peek()
        if m is None:
            return None, None
        self.pos = m.end()
        return m, kind

    def _expect(self, ch: str):
        m, kind = self._next()
        if m is None or m.group("op") != ch:
            raise ValueError(f"expected {ch!r} in {self.text!r}")

    def _slot(self, inner: str) -> Sym:
        inner = inner.strip()
        if inner not in self.slots:
            self.slots[inner] = len(self.slots)
        return Sym(self.slots[inner])

    def _balanced(self) -> str:
        """Capture text up to the matching close-paren (open already consumed)."""
        depth, start = 1, self.pos
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    inner = self.text[start:self.pos]
                    self.pos += 1
                    return inner
            self.pos += 1
        raise ValueError(f"unbalanced parens in {self.text!r}")

    def parse(self) -> Node:
        node = self.expr()
        m, _ = self._peek()
        if m is not None:
            raise ValueError(f"trailing input in {self.text!r}")
        return node

    def expr(self) -> Node:
        node = self.term()
        while True:
            m, kind = self._peek()
            if kind == "op" and m.group("op") in "+-":
                self._next()
                node = BinOp(m.group("op"), node, self.term())
            else:
                return node

    def term(self) -> Node:
        node = self.factor()
        while True:
            m, kind = self._peek()
            if kind == "op" and m.group("op") in "*/":
                self._next()
                node = BinOp(m.group("op"), node, self.factor())
            else:
                return node

    def factor(self) -> Node:
        return self.unary()

    def unary(self) -> Node:
        # unary minus binds LOOSER than '^' (standard precedence):
        # -x^2 = -(x^2), while 2^-3 still parses (power's right side
        # re-enters unary)
        m, kind = self._peek()
        if kind == "op" and m.group("op") in "+-":
            self._next()
            inner = self.unary()
            return Neg(inner) if m.group("op") == "-" else inner
        return self.power()

    def power(self) -> Node:
        node = self.atom()
        m, kind = self._peek()
        if kind == "op" and m.group("op") == "^":
            self._next()
            node = BinOp("^", node, self.unary())
        return node

    def atom(self) -> Node:
        m, kind = self._next()
        if m is None:
            raise ValueError(f"unexpected end of {self.text!r}")
        if kind == "num":
            return Const(float(m.group("num")))
        if kind == "id":
            name = m.group("id")
            nm, nkind = self._peek()
            if nkind == "op" and nm.group("op") == "(":
                self._next()
                inner = self._balanced()
                if name.lower() in _AGG_FNS:
                    return self._slot(inner)
                # non-avg function call: treat whole call as a raw slot
                return self._slot(f"{name}({inner})")
            # bare identifier → sugar for avg(identifier)
            return self._slot(name)
        if kind == "op" and m.group("op") == "(":
            node = self.expr()
            self._expect(")")
            return node
        raise ValueError(f"unexpected token {m.group(0)!r} in {self.text!r}")


def parse_formula(text: str, slots: dict[str, int] | None = None):
    """Parse a metric formula into ``(Node, base_exprs)``.

    ``slots`` lets several formulas (metric + CUPED covariates) share one
    symbol table so a single sufficient-statistics pass covers all of them.
    """
    shared = slots if slots is not None else {}
    node = _Parser(text, shared).parse()
    base = [e for e, _ in sorted(shared.items(), key=lambda kv: kv[1])]
    return simplify(node), base


def parse_formulas(texts: list[str]):
    """Parse several formulas against one shared symbol table."""
    slots: dict[str, int] = {}
    nodes = [_Parser(t, slots).parse() for t in texts]
    base = [e for e, _ in sorted(slots.items(), key=lambda kv: kv[1])]
    return [simplify(n) for n in nodes], base
