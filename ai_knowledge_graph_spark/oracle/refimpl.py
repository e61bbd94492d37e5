"""Deterministic single-node mirror of the engine's phase 2/3 semantics.

This is the *engine's own* oracle: plain-Python implementations of
standardization and inference with exactly the semantics the Spark operators
implement — including the totalized tie-break orders that replace the
reference's Python-set-iteration nondeterminism (SURVEY.md §7 D2). Tests
assert Spark == refimpl EXACTLY on any input; a separate test run compares
both against the actual reference code (imported read-only from
/root/reference with LLM stages off) under the P/R >= 0.95 gate.

Divergences from the reference (all documented, all tie-order only):
  * second-pass scan order: sorted by (char length, lexicographic) instead of
    length-only with hash-order ties (entity_standardization.py:121);
  * lexical pair order: lexicographic instead of set-iteration order (:683);
  * longest-shared-word tie: lexicographically largest instead of first-seen
    (:710).
"""

from __future__ import annotations

from collections import defaultdict

from ..functions.text import limit_predicate_length, normalize_entity


def standardize(triples: list[dict]) -> list[dict]:
    """Mirror of operators/standardize.standardize_triples."""
    valid = [
        t
        for t in triples
        if isinstance(t, dict) and all(k in t and t[k] is not None for k in ("subject", "predicate", "object"))
    ]
    if not valid:
        return []

    counts: dict[str, int] = defaultdict(int)
    for t in valid:
        counts[t["subject"].lower()] += 1
        counts[t["object"].lower()] += 1
    entities = set(counts)

    groups: dict[str, list[str]] = defaultdict(list)
    for e in entities:
        n = normalize_entity(e)
        if n:
            groups[n].append(e)

    mapping: dict[str, str] = {}
    for variants in groups.values():
        winner = min(variants, key=lambda v: (-counts[v], len(v), v))
        for v in variants:
            mapping[v] = winner

    # Second pass over distinct standard forms, scan order (len, lex).
    forms = sorted(set(mapping.values()), key=lambda f: (len(f), f))
    additional: dict[str, str] = {}
    for i, e1 in enumerate(forms):
        w1 = set(e1.split())
        s1 = {w[:4] for w in w1 if len(w) > 4}
        for e2 in forms[i + 1 :]:
            w2 = set(e2.split())
            if w1 <= w2 and w1:
                additional[e2] = e1
            elif w2 <= w1 and w2:
                additional[e1] = e2
            else:
                s2 = {w[:4] for w in w2 if len(w) > 4}
                shared = s1 & s2
                if shared and len(shared) / max(len(s1), len(s2)) > 0.5:
                    if len(e1) <= len(e2):
                        additional[e2] = e1
                    else:
                        additional[e1] = e2
    # Apply-once override: only the exact old-standard-form key is remapped.
    mapping.update(additional)

    out = []
    for t in valid:
        subj = mapping.get(t["subject"].lower(), t["subject"])
        obj = mapping.get(t["object"].lower(), t["object"])
        if subj == obj:
            continue
        out.append(
            {
                "subject": subj,
                "predicate": limit_predicate_length(t["predicate"]),
                "object": obj,
                "chunk": t.get("chunk", 0),
            }
        )
    return out


def infer(triples: list[dict]) -> list[dict]:
    """Mirror of operators/inference.infer_relationships (LLM stages off)."""
    valid = [
        t
        for t in triples
        if isinstance(t, dict)
        and all(t.get(k) is not None for k in ("subject", "predicate", "object"))
    ]
    if len(valid) < 2:
        return list(valid)

    # Last predicate per (s, o); adjacency from distinct pairs.
    last_pred: dict[tuple[str, str], str] = {}
    adj: dict[str, set[str]] = defaultdict(set)
    entities: set[str] = set()
    for t in valid:
        s, o = t["subject"], t["object"]
        last_pred[(s, o)] = t["predicate"]
        adj[s].add(o)
        entities.add(s)
        entities.add(o)

    new_triples: list[dict] = []

    # Transitive one-step composition.
    for subj in adj:
        for mid in adj[subj]:
            for obj in adj.get(mid, ()):
                if subj == obj or (subj, obj) in last_pred:
                    continue
                p1 = last_pred.get((subj, mid), "relates to")
                p2 = last_pred.get((mid, obj), "relates to")
                pred = f"indirectly {p1}" if p1 == p2 else f"{p1} via {mid}"
                new_triples.append(
                    {
                        "subject": subj,
                        "predicate": limit_predicate_length(pred),
                        "object": obj,
                        "inferred": True,
                        "stage": "transitive",
                    }
                )

    # Lexical similarity over lexicographically ordered pairs.
    connected = set(last_pred)
    ents = sorted(entities)
    for i, x in enumerate(ents):
        xlow = x.lower()
        xwords = set(xlow.split())
        for y in ents[i + 1 :]:
            if (x, y) in connected or (y, x) in connected:
                continue
            ylow = y.lower()
            ywords = set(ylow.split())
            shared = xwords & ywords
            if shared:
                main = max(shared, key=lambda w: (len(w), w))
                if len(main) < 4:
                    continue
                if xlow.startswith(main) and not ylow.startswith(main):
                    trip = (y, "relates to", x)
                elif ylow.startswith(main) and not xlow.startswith(main):
                    trip = (x, "relates to", y)
                else:
                    trip = (x, "related to", y)
            elif xlow in ylow:
                trip = (y, "is type of", x)
            elif ylow in xlow:
                trip = (x, "is type of", y)
            else:
                continue
            new_triples.append(
                {
                    "subject": trip[0],
                    "predicate": trip[1],
                    "object": trip[2],
                    "inferred": True,
                    "stage": "lexical",
                }
            )

    merged = valid + new_triples

    # Dedup: last non-inferred wins, else an inferred copy.
    survivors: dict[tuple, dict] = {}
    for t in merged:
        key = (t["subject"], t["predicate"], t["object"])
        if key not in survivors or not t.get("inferred", False):
            survivors[key] = t

    out = []
    for t in survivors.values():
        t = dict(t)
        t["predicate"] = limit_predicate_length(t["predicate"])
        if t["subject"] != t["object"]:
            out.append(t)
    return out


def connected_component_sets(triples: list[dict]) -> list[set[str]]:
    """Undirected components via union-find (oracle for operators/components)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for t in triples:
        for e in (t["subject"], t["object"]):
            parent.setdefault(e, e)
        a, b = find(t["subject"]), find(t["object"])
        if a != b:
            parent[a] = b

    comps: dict[str, set[str]] = defaultdict(set)
    for e in parent:
        comps[find(e)].add(e)
    return list(comps.values())
