"""HTML visualization sink (SURVEY §2.1 K4; visualization.py:19-351).

The reference renders the whole graph through PyVis. At 100 TB the graph
does not fit a browser, so the distributed part of this operator is the
*sampling/aggregation*: top-N nodes by degree (visualization sizes nodes by
centrality, :207-227), their induced edges, and community colors — all
DataFrame work. Only the final ≤N-node subgraph is collected and written as
one self-contained HTML file (inline JSON + a dependency-free canvas
force-layout, since PyVis isn't available and a sink should not require a
rendering stack).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title>
<style>body{{margin:0;background:#fff;font:12px sans-serif}}canvas{{display:block}}</style>
</head><body><canvas id="c"></canvas><script>
const DATA = {data};
const W = innerWidth, H = innerHeight, cv = document.getElementById('c');
cv.width = W; cv.height = H; const ctx = cv.getContext('2d');
const N = DATA.nodes, E = DATA.edges;
const idx = Object.fromEntries(N.map((n, i) => [n.id, i]));
N.forEach((n, i) => {{
  const a = 2 * Math.PI * i / N.length;
  n.x = W/2 + Math.cos(a) * H/3; n.y = H/2 + Math.sin(a) * H/3;
  n.vx = 0; n.vy = 0;
}});
const PALETTE = ['#4c78a8','#f58518','#54a24b','#e45756','#72b7b2','#b279a2','#9d755d','#eeca3b'];
function step() {{
  for (const e of E) {{
    const a = N[idx[e.s]], b = N[idx[e.t]]; if (!a || !b) continue;
    const dx = b.x-a.x, dy = b.y-a.y, d = Math.hypot(dx,dy)||1, f = (d-80)*0.002;
    a.vx += f*dx/d; a.vy += f*dy/d; b.vx -= f*dx/d; b.vy -= f*dy/d;
  }}
  for (let i = 0; i < N.length; i++) for (let j = i+1; j < N.length; j++) {{
    const a = N[i], b = N[j], dx = b.x-a.x, dy = b.y-a.y;
    const d2 = dx*dx+dy*dy+0.01, f = 600/d2;
    a.vx -= f*dx; a.vy -= f*dy; b.vx += f*dx; b.vy += f*dy;
  }}
  for (const n of N) {{
    n.vx += (W/2-n.x)*0.0005; n.vy += (H/2-n.y)*0.0005;
    n.x += n.vx *= 0.85; n.y += n.vy *= 0.85;
  }}
}}
function draw() {{
  ctx.clearRect(0,0,W,H); ctx.strokeStyle = '#ccc';
  for (const e of E) {{
    const a = N[idx[e.s]], b = N[idx[e.t]]; if (!a || !b) continue;
    ctx.beginPath(); ctx.moveTo(a.x,a.y); ctx.lineTo(b.x,b.y); ctx.stroke();
  }}
  for (const n of N) {{
    ctx.fillStyle = PALETTE[n.c % PALETTE.length];
    ctx.beginPath(); ctx.arc(n.x, n.y, n.r, 0, 7); ctx.fill();
    ctx.fillStyle = '#333'; ctx.fillText(n.id, n.x + n.r + 2, n.y + 3);
  }}
}}
let t = 0; (function loop() {{ step(); draw(); if (t++ < 300) requestAnimationFrame(loop); }})();
</script></body></html>
"""


def render_html(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    max_nodes: int = 150,
) -> dict:
    """Sample the graph distributedly, write one standalone HTML file.

    nodes: (entity, degree, component_id) — degree sizes the dot
    (10 + 20*importance, visualization.py:207-227, importance = normalized
    degree); component_id colors it (communities, :186-205).
    edges: (src, dst, relation).

    Returns the stats dict the reference prints (:154-162).
    """
    top = (
        nodes.orderBy(F.desc("degree"), F.asc("entity"))
        .limit(max_nodes)
        .select("entity", "degree", "component_id")
    )
    rows = top.collect()
    keep = {r["entity"] for r in rows}
    max_deg = max((r["degree"] for r in rows), default=1) or 1
    node_payload = [
        {
            "id": r["entity"],
            "r": 5 + round(10.0 * r["degree"] / max_deg, 1),
            "c": int(r["component_id"] or 0),
        }
        for r in rows
    ]
    edge_rows = (
        edges.filter(F.col("src").isin(keep) & F.col("dst").isin(keep))
        .select("src", "dst")
        .distinct()
        .collect()
    )
    edge_payload = [{"s": r["src"], "t": r["dst"]} for r in edge_rows]

    data = json.dumps({"nodes": node_payload, "edges": edge_payload})
    with open(path, "w") as f:
        f.write(_PAGE.format(data=data))
    return {
        "nodes_rendered": len(node_payload),
        "edges_rendered": len(edge_payload),
        "path": path,
    }
