"""Plan visualizers -> Graphviz dot (ref: visualization/
abstract_visualizer.hpp:17-29, lqp_visualizer.hpp (cardinality-annotated
edges), pqp_visualizer.hpp (per-operator runtime coloring)).

Emits dot source text; rendering is left to a host graphviz install when
present (`dot -Tpng`), mirroring the reference's console `visualize`.
"""

from __future__ import annotations

import html
import shutil
import subprocess
from typing import Dict, Optional

from hyrise_tpu.plan import lqp as L


class LQPVisualizer:
    """Cardinality-annotated logical plan graph."""

    def __init__(self, estimator=None):
        if estimator is None:
            from hyrise_tpu.statistics.cardinality import CardinalityEstimator

            estimator = CardinalityEstimator()
        self.est = estimator

    def to_dot(self, root: L.LQPNode) -> str:
        lines = [
            "digraph LQP {",
            "rankdir=BT;",
            'node [shape=record, fontname="monospace", fontsize=10];',
        ]
        ids: Dict[int, str] = {}

        def visit(node: L.LQPNode) -> str:
            if id(node) in ids:
                return ids[id(node)]
            name = f"n{len(ids)}"
            ids[id(node)] = name
            label = html.escape(node.description()).replace("|", "\\|")
            lines.append(f'{name} [label="{label}"];')
            for child in node.inputs():
                cn = visit(child)
                rows = self.est.estimate(child)
                lines.append(f'{cn} -> {name} [label="~{rows:,.0f} rows"];')
            return name

        visit(root)
        lines.append("}")
        return "\n".join(lines)


class PQPVisualizer:
    """Physical plan graph colored by measured runtime (ref:
    pqp_visualizer — color-by-cost)."""

    def to_dot(self, root) -> str:
        ops = []

        def collect(op):
            if op in ops:
                return
            ops.append(op)
            for child in op.inputs():
                collect(child)
            for sub in op.uncorrelated_subquery_plans.values():
                collect(sub)

        collect(root)
        total_ns = sum(op.performance_data.walltime_ns for op in ops) or 1
        lines = [
            "digraph PQP {",
            "rankdir=BT;",
            'node [shape=record, style=filled, fontname="monospace", fontsize=10];',
        ]
        ids = {id(op): f"n{i}" for i, op in enumerate(ops)}
        for op in ops:
            pd = op.performance_data
            frac = pd.walltime_ns / total_ns
            color = _heat_color(frac)
            label = html.escape(op._describe_self()).replace("|", "\\|")
            extra = (
                f"\\n{pd.walltime_ns / 1e6:.2f} ms, {pd.output_rows} rows"
                if pd.executed else ""
            )
            lines.append(
                f'{ids[id(op)]} [label="{label}{extra}", fillcolor="{color}"];'
            )
        for op in ops:
            for child in op.inputs():
                lines.append(f"{ids[id(child)]} -> {ids[id(op)]};")
            for sub in op.uncorrelated_subquery_plans.values():
                lines.append(
                    f"{ids[id(sub)]} -> {ids[id(op)]} [style=dashed];"
                )
        lines.append("}")
        return "\n".join(lines)


class JoinGraphVisualizer:
    """Join-graph rendering: vertices + predicate edges (ref:
    join_graph_visualizer.hpp)."""

    def to_dot(self, vertices, predicates) -> str:
        lines = ["graph JoinGraph {", 'node [shape=box, fontname="monospace"];']
        names = {}
        for i, v in enumerate(vertices):
            names[id(v)] = f"v{i}"
            lines.append(f'v{i} [label="{html.escape(v.description())}"];')
        for p, (a, b) in predicates:
            lines.append(
                f'{names[id(a)]} -- {names[id(b)]} '
                f'[label="{html.escape(p.description())}"];'
            )
        lines.append("}")
        return "\n".join(lines)


def render_dot(dot: str, out_path: str) -> Optional[str]:
    """Render via graphviz if installed; otherwise write the .dot source."""
    if shutil.which("dot") and not out_path.endswith(".dot"):
        fmt = out_path.rsplit(".", 1)[-1]
        proc = subprocess.run(
            ["dot", f"-T{fmt}", "-o", out_path],
            input=dot.encode(), capture_output=True,
        )
        if proc.returncode == 0:
            return out_path
    dot_path = out_path if out_path.endswith(".dot") else out_path + ".dot"
    with open(dot_path, "w") as fh:
        fh.write(dot)
    return dot_path


def _heat_color(frac: float) -> str:
    """white -> red heat by runtime share."""
    g = int(255 * (1.0 - min(frac, 1.0) * 0.85))
    return f"#ff{g:02x}{g:02x}"
