import math

import pytest

from fast_causal_inference_spark.formula import (
    Const,
    parse_formula,
    parse_formulas,
    simplify,
)


def test_parse_ratio():
    node, base = parse_formula("avg(numerator)/avg(denominator)")
    assert base == ["numerator", "denominator"]
    assert node.value([6.0, 2.0]) == 3.0


def test_bare_identifier_sugar():
    node, base = parse_formula("x1/x2")
    assert base == ["x1", "x2"]
    assert node.value([1.0, 4.0]) == 0.25


def test_shared_slots():
    nodes, base = parse_formulas(["avg(a)/avg(b)", "avg(b)+avg(c)"])
    assert base == ["a", "b", "c"]
    assert nodes[0].value([2.0, 4.0, 1.0]) == 0.5
    assert nodes[1].value([2.0, 4.0, 1.0]) == 5.0


def test_nested_inner_expression():
    node, base = parse_formula("avg(x*y + 1)/avg(if(z > 0, 1, 0))")
    assert base == ["x*y + 1", "if(z > 0, 1, 0)"]


def test_gradient_ratio():
    node, base = parse_formula("avg(n)/avg(d)")
    g = node.gradient(2)
    # d(n/d)/dn = 1/d ; d(n/d)/dd = -n/d^2
    assert g[0].value([6.0, 2.0]) == pytest.approx(0.5)
    assert g[1].value([6.0, 2.0]) == pytest.approx(-1.5)


def test_gradient_product_and_power():
    node, _ = parse_formula("avg(a)*avg(b) + avg(a)^2")
    g = node.gradient(2)
    assert g[0].value([3.0, 4.0]) == pytest.approx(4.0 + 6.0)
    assert g[1].value([3.0, 4.0]) == pytest.approx(3.0)


def test_numeric_gradient_agreement():
    node, base = parse_formula("(avg(a)+2*avg(b))/(avg(c)*avg(a)) - avg(b)/3")
    point = [1.3, 2.7, 0.9]
    g = node.gradient(3)
    eps = 1e-7
    for i in range(3):
        up = list(point)
        dn = list(point)
        up[i] += eps
        dn[i] -= eps
        num = (node.value(up) - node.value(dn)) / (2 * eps)
        assert g[i].value(point) == pytest.approx(num, rel=1e-5)


def test_constant_folding():
    node, _ = parse_formula("avg(x)*1 + 0/avg(y) + 2*3")
    s = simplify(node)
    assert s.value([5.0, 7.0]) == pytest.approx(11.0)


def test_unary_minus():
    node, _ = parse_formula("-avg(x) + 2")
    assert node.value([3.0]) == pytest.approx(-1.0)


def test_errors():
    with pytest.raises(ValueError):
        parse_formula("avg(x) +")
    with pytest.raises(ValueError):
        parse_formula("avg(x")


def test_const_fold_value():
    node, base = parse_formula("1+2*3")
    assert isinstance(node, Const) and node.v == 7.0 and base == []
