"""Topology visualisation — DOT text with per-entity-type shapes/colors
and join clusters, mirroring the reference's GraphViz rendering
(viz.clj:9-61) with zero dependencies (graphviz optional for images).

If the topology has been run (pass ``outputs`` from run_topology plus a
sample limit), node labels embed sampled output records — the
reference's data-flow visualisation (viz.clj:36-40).
"""

from __future__ import annotations

from . import model

_STYLE = {
    model.TOPIC: ("box", "lightblue"),
    model.KSTREAM: ("ellipse", "palegreen"),
    model.KTABLE: ("ellipse", "khaki"),
    model.GLOBAL_KTABLE: ("ellipse", "lightsalmon"),
}


def _esc(s: str) -> str:
    return str(s).replace('"', '\\"').replace("\n", "\\n")


def to_dot(topology: dict, outputs: dict | None = None, sample: int = 3) -> str:
    lines = [
        "digraph topology {",
        "  rankdir=LR;",
        "  node [style=filled, fontname=Helvetica];",
    ]
    for eid, ent in topology["entities"].items():
        shape, color = _STYLE.get(ent["type"], ("ellipse", "white"))
        label = f"{eid}\\n[{ent['type']}]"
        if outputs is not None and eid in outputs:
            try:
                rows = outputs[eid].limit(sample).collect()
                recs = "\\n".join(
                    _esc(f"{r[model.KEY]!r}:{r[model.VALUE]!r}") for r in rows
                )
                if recs:
                    label += f"\\n{recs}"
            except Exception:
                pass
        lines.append(f'  "{_esc(eid)}" [shape={shape}, fillcolor={color}, label="{label}"];')
    for src, dst in topology["workflow"]:
        lines.append(f'  "{_esc(src)}" -> "{_esc(dst)}";')
    # join clusters labeled by join type (viz.clj:49-58)
    for i, (ids, cfg) in enumerate((topology.get("joins") or {}).items()):
        jt = cfg.get("type", "merge")
        members = " ".join(f'"{_esc(x)}";' for x in ids)
        lines.append(
            f'  subgraph cluster_join_{i} {{ label="{jt} join"; style=dashed; {members} }}'
        )
    lines.append("}")
    return "\n".join(lines)


def save_dot(topology: dict, path: str, outputs: dict | None = None) -> str:
    dot = to_dot(topology, outputs)
    with open(path, "w") as f:
        f.write(dot)
    return path


def render(topology: dict, path: str = "topology.png", outputs: dict | None = None) -> str:
    """Render to an image if the graphviz binary exists; otherwise write
    ``path + '.dot'`` and say so (reference errors similarly when
    graphviz is missing, viz.clj:60-61)."""
    import shutil
    import subprocess
    import tempfile

    dot = to_dot(topology, outputs)
    if shutil.which("dot") is None:
        out = path + ".dot"
        with open(out, "w") as f:
            f.write(dot)
        return out
    with tempfile.NamedTemporaryFile("w", suffix=".dot", delete=False) as f:
        f.write(dot)
        src = f.name
    fmt = path.rsplit(".", 1)[-1]
    subprocess.run(["dot", f"-T{fmt}", src, "-o", path], check=True)
    return path
