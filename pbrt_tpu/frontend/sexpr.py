"""Tiny s-expression parser for the fork's portalData syntax.

Counterpart of the vendored sexpresso parser (src/ext/sexpresso.{hpp,cpp})
as consumed by CreateAAPortal (lights/portal_arealight.cpp:256-292):
``"((AA lox loy loz hix hiy hiz axis ±) ...)"``.
"""

from __future__ import annotations


def parse_sexpr(s: str):
    """Parse into nested lists of strings."""
    tokens = s.replace("(", " ( ").replace(")", " ) ").split()
    pos = 0

    def parse():
        nonlocal pos
        out = []
        while pos < len(tokens):
            t = tokens[pos]
            pos += 1
            if t == "(":
                out.append(parse())
            elif t == ")":
                return out
            else:
                out.append(t)
        return out

    return parse()


def parse_portal_data(s: str):
    """portalData string → list of (lo, hi, axis, facing_fw) tuples
    (lights/portal_arealight.cpp:257-283)."""
    tree = parse_sexpr(s)
    # outermost parse yields [ [ [AA ...], [AA ...] ] ]
    root = tree[0] if tree and isinstance(tree[0], list) else tree
    portals = []
    for node in root:
        if not isinstance(node, list) or not node or node[0] != "AA":
            continue
        vals = [float(x) for x in node[1:7]]
        axis = int(node[7])
        facing = node[8] == "+"
        portals.append(((vals[0], vals[1], vals[2]),
                        (vals[3], vals[4], vals[5]), axis, facing))
    return portals
