"""Parser for the reference's halo2 golden-value test-data headers.

The reference pins every intermediate of its halo2 example circuits
(pinned constraint-system/VK strings, assembly fixed columns, cycle-store
mapping, keygen polys, per-phase commitments/challenges/evals, and the
final proof bytes) as constexpr arrays in
tachyon/zk/plonk/examples/*_test_data.h (reference:
simple_circuit_test_data.h:30-345, circuit_test.h:29-268).  Rather than
committing copies of those vectors, the golden tests parse them from the
read-only reference checkout at test time and skip when it is absent.

Nothing here imports JAX; it is plain text processing.
"""
from __future__ import annotations

import os
import re

REFERENCE_EXAMPLES = "/root/reference/tachyon/zk/plonk/examples"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_EXAMPLES)


def _strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.S)


def _split_classes(text: str) -> dict:
    """Returns {condition_tag: class_body}; tag is e.g.
    'IsSimpleFloorPlanner', 'IsV1FloorPlanner' or the raw enable_if
    expression ('' for the unconditional base)."""
    out = {}
    for m in re.finditer(
        r"class \w*TestData<[^>]*,\s*std::enable_if_t<([^>]*(?:<[^>]*>)?[^>]*)>>\s*"
        r":[^{]*\{(.*?)\n\};",
        text,
        flags=re.S,
    ):
        out[m.group(1).strip()] = m.group(2)
    return out


def _find_member(body: str, name: str):
    """Returns the raw initializer text of `constexpr static ... name... = ...;`"""
    m = re.search(
        rf"constexpr static [^=;]*\b{re.escape(name)}\s*(?:\[[^\]]*\])*\s*=\s*(.*?);\n",
        body,
        flags=re.S,
    )
    return m.group(1) if m else None


def _parse_string(raw: str) -> str:
    """Concatenated C string literals -> python str (handles \\" escapes)."""
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', raw)
    return "".join(p.replace('\\"', '"').replace("\\\\", "\\") for p in parts)


def _parse_hex_list(raw: str) -> list:
    return [int(h, 16) for h in re.findall(r'"(0x[0-9a-fA-F]+)"', raw)]


def _parse_nested_hex(raw: str) -> list:
    """{{"0x..", ...}, {...}} -> list of lists of ints (depth 2)."""
    rows = []
    depth = 0
    cur = None
    for tok in re.finditer(r'[{}]|"(0x[0-9a-fA-F]+)"', raw):
        t = tok.group(0)
        if t == "{":
            depth += 1
            if depth == 2:
                cur = []
        elif t == "}":
            if depth == 2 and cur is not None:
                rows.append(cur)
                cur = None
            depth -= 1
        else:
            if cur is not None:
                cur.append(int(tok.group(1), 16))
    return rows


def _parse_points(raw: str):
    """Point arrays: pairs of hex strings -> [(x, y), ...] flat, or nested
    by braces depth-2 groups."""
    # depth-aware: Point x[][k] = { { {"0x","0x"}, ... }, ... }
    groups = []
    depth = 0
    cur_group = None
    cur_point = None
    for tok in re.finditer(r'[{}]|"(0x[0-9a-fA-F]+)"', raw):
        t = tok.group(0)
        if t == "{":
            depth += 1
            if depth == 2:
                cur_group = []
            elif depth == 3:
                cur_point = []
        elif t == "}":
            if depth == 3 and cur_point is not None:
                cur_group.append(tuple(cur_point))
                cur_point = None
            elif depth == 2 and cur_group is not None:
                groups.append(cur_group)
                cur_group = None
            depth -= 1
        else:
            v = int(tok.group(1), 16)
            if cur_point is not None:
                cur_point.append(v)
            elif cur_group is not None:
                # depth-2 point: Point x[] = { {"0x..","0x.."}, ... }
                cur_group.append(v)
    if groups and all(
        isinstance(g, list) and g and isinstance(g[0], int) for g in groups
    ):
        # flat Point[] list: each group is [x, y]
        return [(g[0], g[1]) for g in groups]
    return groups


def _parse_labels(raw: str) -> list:
    """Label x[][kN] = {{{c, r}, ...}, ...} -> [[(c, r), ...], ...]"""
    rows = []
    for row in re.finditer(r"\{((?:\s*\{\s*\d+\s*,\s*\d+\s*\},?)+)\s*\}", raw):
        rows.append([
            (int(a), int(b))
            for a, b in re.findall(r"\{\s*(\d+)\s*,\s*(\d+)\s*\}", row.group(1))
        ])
    return rows


def _parse_int_rows(raw: str) -> list:
    rows = []
    for row in re.finditer(r"\{([^{}]*)\}", raw):
        vals = re.findall(r"(?:\btrue\b|\bfalse\b|\d+)", row.group(1))
        if vals:
            rows.append([
                1 if v == "true" else (0 if v == "false" else int(v))
                for v in vals
            ])
    return rows


def _parse_column_keys(raw: str) -> list:
    """AnyColumnKey arrays -> [('instance', 0), ('fixed', 0), ...]"""
    kinds = {"Instance": "instance", "Fixed": "fixed", "Advice": "advice"}
    return [
        (kinds[k], int(i))
        for k, i in re.findall(r"(Instance|Fixed|Advice)ColumnKey\((\d+)\)", raw)
    ]


class GoldenData:
    """Accessor over one test-data class body."""

    def __init__(self, body: str):
        self.body = body

    def string(self, name):
        raw = _find_member(self.body, name)
        return _parse_string(raw) if raw is not None else None

    def hex_int(self, name):
        s = self.string(name)
        return int(s, 16) if s else None

    def hex_list(self, name):
        raw = _find_member(self.body, name)
        return _parse_hex_list(raw) if raw is not None else None

    def hex_rows(self, name):
        raw = _find_member(self.body, name)
        return _parse_nested_hex(raw) if raw is not None else None

    def points(self, name):
        raw = _find_member(self.body, name)
        return _parse_points(raw) if raw is not None else None

    def labels(self, name):
        raw = _find_member(self.body, name)
        return _parse_labels(raw) if raw is not None else None

    def int_rows(self, name):
        raw = _find_member(self.body, name)
        return _parse_int_rows(raw) if raw is not None else None

    def column_keys(self, name):
        raw = _find_member(self.body, name)
        return _parse_column_keys(raw) if raw is not None else None

    def proof_bytes(self, name="kProof"):
        raw = _find_member(self.body, name)
        if raw is None:
            return None
        return bytes(int(v) for v in re.findall(r"\d+", raw))

    def scalar(self, name):
        raw = _find_member(self.body, name)
        if raw is None:
            return None
        m = re.search(r"\d+", raw)
        return int(m.group(0)) if m else None


def load(circuit: str, planner: str = "IsSimpleFloorPlanner") -> GoldenData:
    """circuit: e.g. 'simple_circuit'; planner: enable_if condition tag
    (ignored when the header has a single unconditional data class)."""
    path = os.path.join(REFERENCE_EXAMPLES, f"{circuit}_test_data.h")
    with open(path) as f:
        text = _strip_comments(f.read())
    classes = _split_classes(text)
    for tag, body in classes.items():
        if planner in tag:
            return GoldenData(body)
    if not classes:
        m = re.search(
            r"class \w*TestData\b[^{]*\{(.*)\n\};", text, flags=re.S)
        if m:
            return GoldenData(m.group(1))
    raise KeyError(f"{planner} not found in {path}: {list(classes)}")
