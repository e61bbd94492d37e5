"""KG analytics operators (graph/kgops.py): rule mining, fact fusion,
snapshot diff, entity typing — hand-computed semantics on tiny graphs."""

from pyspark.sql import Row

from ai_knowledge_graph_spark.graph.kgops import (
    entity_roles,
    fuse_facts,
    kg_diff,
    mine_rules,
)


def _spo(spark, rows):
    return spark.createDataFrame(
        [Row(subject=s, predicate=p, object=o) for s, p, o in rows]
    )


def test_mine_rules_support_and_confidence(spark):
    # parent(A,B) ∧ parent(B,C) ⇒ grandparent(A,C): two instances support
    # the rule; one extra body instance (c->d->e) lacks the head.
    rows = [
        ("a", "parent", "b"), ("b", "parent", "c"), ("a", "grandparent", "c"),
        ("x", "parent", "y"), ("y", "parent", "z"), ("x", "grandparent", "z"),
        ("c", "parent", "d"), ("d", "parent", "e"),
    ]
    out = mine_rules(_spo(spark, rows), min_support=2).collect()
    got = {(r.p, r.q, r.r): (r.support, r.body_count, r.confidence) for r in out}
    assert got[("parent", "parent", "grandparent")] == (2, 4, 0.5)
    # min_support prunes singleton-support rules entirely
    assert all(s >= 2 for s, _, _ in got.values())


def test_mine_rules_distinct_instances_not_mentions(spark):
    # duplicated SPO mentions must not inflate support or body count
    rows = [
        ("a", "p", "b"), ("a", "p", "b"),
        ("b", "q", "c"), ("b", "q", "c"),
        ("a", "r", "c"), ("a", "r", "c"),
        ("x", "p", "y"), ("y", "q", "z"), ("x", "r", "z"),
    ]
    out = mine_rules(_spo(spark, rows), min_support=1).collect()
    got = {(r.p, r.q, r.r): (r.support, r.body_count) for r in out}
    assert got[("p", "q", "r")] == (2, 2)


def test_fuse_facts_majority_and_tiebreaks(spark):
    rows = [
        # (s,o) pair 1: 'likes' in 2 docs, 'loves' in 1 -> likes wins
        Row(subject="a", predicate="likes", object="b", doc_id=1),
        Row(subject="a", predicate="likes", object="b", doc_id=2),
        Row(subject="a", predicate="loves", object="b", doc_id=3),
        # pair 2: doc-tie (1 each), mention-tie -> lexicographic 'hates'
        Row(subject="c", predicate="hates", object="d", doc_id=1),
        Row(subject="c", predicate="wants", object="d", doc_id=2),
    ]
    out = {(r.subject, r.object): r for r in fuse_facts(spark.createDataFrame(rows)).collect()}
    ab = out[("a", "b")]
    assert ab.predicate == "likes" and ab.n_docs == 2 and ab.pair_docs == 3
    assert abs(ab.support_ratio - round(2 / 3, 6)) < 1e-9
    cd = out[("c", "d")]
    assert cd.predicate == "hates" and cd.pair_docs == 2 and cd.support_ratio == 0.5


def test_kg_diff_statuses(spark):
    old = _spo(spark, [("a", "p", "b"), ("b", "p", "c")])
    new = _spo(spark, [("b", "p", "c"), ("c", "p", "d")])
    out = {(r.subject, r.predicate, r.object): r.status
           for r in kg_diff(old, new).collect()}
    assert out[("a", "p", "b")] == "removed"
    assert out[("b", "p", "c")] == "kept"
    assert out[("c", "p", "d")] == "added"


def test_entity_roles_degrees_and_dominant_predicates(spark):
    rows = [
        ("a", "p", "b"), ("a", "p", "c"), ("a", "q", "b"),
        ("b", "q", "c"),
    ]
    out = {r.entity: r for r in entity_roles(_spo(spark, rows)).collect()}
    assert out["a"].n_out == 3 and out["a"].n_in == 0
    assert out["a"].top_out_pred == "p" and out["a"].top_in_pred is None
    # b: in-edges a-p->b, a-q->b (tie 1/1 -> lexicographic 'p'); out q->c
    assert out["b"].n_in == 2 and out["b"].top_in_pred == "p"
    assert out["b"].n_out == 1 and out["b"].top_out_pred == "q"
    assert out["c"].n_out == 0 and out["c"].n_in == 2


def test_mine_rules_fanout_guard_drops_only_hub_bodies(spark):
    # star hub: h has in-degree 3 and out-degree 3 (fanout 9); a cold chain
    # coexists. With max_join_fanout=8 the hub's body instances vanish,
    # the cold chain's rule survives, and nothing new appears.
    hub = [(f"a{i}", "pin", "h") for i in range(3)] + [
        ("h", "pout", f"c{i}") for i in range(3)
    ]
    cold = [("x", "p", "y"), ("y", "q", "z"), ("x", "r", "z"),
            ("u", "p", "v"), ("v", "q", "w"), ("u", "r", "w")]
    spo = _spo(spark, hub + cold)
    unguarded = {(r.p, r.q, r.r) for r in mine_rules(spo, min_support=1).collect()}
    guarded = {(r.p, r.q, r.r)
               for r in mine_rules(spo, min_support=1, max_join_fanout=8).collect()}
    assert ("pin", "pout", None) not in guarded  # sanity of tuple shape
    assert not any(p == "pin" and q == "pout" for p, q, _ in guarded)
    assert ("p", "q", "r") in guarded
    assert guarded <= unguarded


def test_triple_history_runs_and_reappearance(spark):
    from ai_knowledge_graph_spark.graph.kgops import triple_history

    s0 = _spo(spark, [("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f")])
    s1 = _spo(spark, [("a", "p", "b"), ("e", "p", "f")])
    s2 = _spo(spark, [("a", "p", "b"), ("c", "p", "d")])
    out = triple_history([s0, s1, s2]).collect()
    got = {}
    for r in out:
        got.setdefault((r.subject, r.predicate, r.object), set()).add(
            (r.first_snap, r.last_snap, r.is_current)
        )
    # a-p-b: present all three snaps -> one current run
    assert got[("a", "p", "b")] == {(0, 2, True)}
    # c-p-d: present 0, absent 1, back at 2 -> two runs, second current
    assert got[("c", "p", "d")] == {(0, 0, False), (2, 2, True)}
    # e-p-f: present 0-1, gone at 2 -> one closed run
    assert got[("e", "p", "f")] == {(0, 1, False)}


def test_triple_history_exhaustive_masks(spark):
    # every non-empty presence pattern over 5 snapshots, one synthetic
    # triple per mask; runs must match a plain-Python reference exactly.
    from ai_knowledge_graph_spark.graph.kgops import triple_history

    n = 5
    rows_by_snap = {i: [] for i in range(n)}
    for mask in range(1, 1 << n):
        for i in range(n):
            if mask >> i & 1:
                rows_by_snap[i].append((f"m{mask}", "p", "x"))
    snaps = [_spo(spark, rows_by_snap[i]) for i in range(n)]
    got = {}
    for r in triple_history(snaps).collect():
        got.setdefault(r.subject, set()).add(
            (r.first_snap, r.last_snap, r.is_current)
        )

    def ref_runs(mask):
        runs, i = set(), 0
        while i < n:
            if mask >> i & 1:
                j = i
                while j + 1 < n and mask >> (j + 1) & 1:
                    j += 1
                runs.add((i, j, j == n - 1))
                i = j + 1
            else:
                i += 1
        return runs

    for mask in range(1, 1 << n):
        assert got[f"m{mask}"] == ref_runs(mask), mask


def test_kg_negatives_filtered_and_deterministic(spark):
    from ai_knowledge_graph_spark.graph.kgops import kg_negatives

    rows = [("a", "p", "b"), ("b", "p", "c"), ("a", "q", "c")]
    out = kg_negatives(_spo(spark, rows), k=4).collect()
    true = set(rows)
    for r in out:
        neg = (r.neg_subject, r.predicate, r.neg_object)
        # filtered protocol: no corruption may be a true triple (this also
        # bans the identity corruption)
        assert neg not in true, neg
        # exactly one side corrupted; the other side preserved
        assert (r.neg_subject == r.subject) != (r.neg_object == r.object) or (
            r.neg_subject != r.subject and r.neg_object == r.object
        ) or (r.neg_subject == r.subject and r.neg_object != r.object)
        # replacement comes from the entity vocabulary
        vocab = {"a", "b", "c"}
        assert r.neg_subject in vocab and r.neg_object in vocab
    # deterministic: a rerun yields the identical multiset
    again = kg_negatives(_spo(spark, rows), k=4).collect()
    key = lambda r: (r.subject, r.predicate, r.object, r.neg_idx,
                     r.neg_subject, r.neg_object)
    assert sorted(map(key, out)) == sorted(map(key, again))
    # at most k negatives per positive, indices within range
    from collections import Counter
    per = Counter((r.subject, r.predicate, r.object) for r in out)
    assert all(v <= 4 for v in per.values())
    assert all(0 <= r.neg_idx < 4 for r in out)


def test_kg_negatives_exactly_one_side_corrupted(spark):
    from ai_knowledge_graph_spark.graph.kgops import kg_negatives

    rows = [(f"e{i}", "p", f"e{i+1}") for i in range(20)]
    out = kg_negatives(_spo(spark, rows), k=2).collect()
    assert out, "20-triple graph with 21 entities must yield some negatives"
    for r in out:
        head_changed = r.neg_subject != r.subject
        tail_changed = r.neg_object != r.object
        assert head_changed != tail_changed, r


def test_match_basic_pattern_two_hop_with_constant(spark):
    from ai_knowledge_graph_spark.graph.kgops import match_basic_pattern

    rows = [
        ("a", "knows", "b"), ("b", "knows", "c"), ("b", "likes", "d"),
        ("c", "knows", "a"),
    ]
    out = match_basic_pattern(
        _spo(spark, rows), [("?x", "knows", "?y"), ("?y", "knows", "?z")]
    ).collect()
    got = {(r.x, r.y, r.z) for r in out}
    assert got == {("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b")}
    assert sorted(out[0].asDict()) == ["x", "y", "z"]


def test_match_basic_pattern_var_predicate_and_closing_edge(spark):
    from ai_knowledge_graph_spark.graph.kgops import match_basic_pattern

    rows = [
        ("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"),  # closed triangle
        ("x", "p", "y"), ("y", "q", "z"),                    # open wedge
    ]
    out = match_basic_pattern(
        _spo(spark, rows),
        [("?a", "?p", "?b"), ("?b", "?q", "?c"), ("?a", "?r", "?c")],
    ).collect()
    assert {(r.a, r.b, r.c, r.p, r.q, r.r) for r in out} == {
        ("a", "b", "c", "p", "q", "r")
    }


def test_match_basic_pattern_repeated_var_is_equality(spark):
    from ai_knowledge_graph_spark.graph.kgops import match_basic_pattern

    rows = [("a", "self", "a"), ("a", "self", "b")]
    out = match_basic_pattern(_spo(spark, rows), [("?x", "self", "?x")]).collect()
    assert [(r.x) for r in out] == ["a"]


def test_match_basic_pattern_guards(spark):
    import pytest

    from ai_knowledge_graph_spark.graph.kgops import match_basic_pattern

    spo = _spo(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="no variables"):
        match_basic_pattern(spo, [("a", "p", "b")])
    with pytest.raises(ValueError, match="disconnected"):
        match_basic_pattern(spo, [("?x", "p", "?y"), ("?u", "p", "?v")])


def test_entity_summary_idf_ranking_and_cap(spark):
    from ai_knowledge_graph_spark.graph.kgops import entity_summary

    # 'rare' appears once (high idf), 'common' four times (low idf).
    rows = [
        ("a", "rare", "r1"),
        ("a", "common", "c1"), ("a", "common", "c2"), ("a", "common", "c3"),
        ("b", "common", "c4"),
    ]
    out = entity_summary(_spo(spark, rows), k=3).collect()
    a = sorted((r for r in out if r.entity == "a"), key=lambda r: r.fact_rank)
    # rank 1 = the rare fact, then common facts by object asc, capped at k=3
    assert [(r.predicate, r.object) for r in a] == [
        ("rare", "r1"), ("common", "c1"), ("common", "c2")
    ]
    assert a[0].idf_micro > a[1].idf_micro
    assert [r.fact_rank for r in a] == [1, 2, 3]
    # idf is ln(5/1) and ln(5/4) in micro-units
    import math
    assert a[0].idf_micro == round(math.log(5 / 1) * 1e6)
    assert a[1].idf_micro == round(math.log(5 / 4) * 1e6)


def test_entity_summary_two_phase_rank_is_lossless(spark):
    from ai_knowledge_graph_spark.graph.kgops import entity_summary

    # 40 facts on one entity across many buckets: top-2 must equal the
    # global order regardless of bucketing.
    rows = [("hub", f"p{i:02d}", f"o{i:02d}") for i in range(40)]
    out = entity_summary(_spo(spark, rows), k=2, n_buckets=8).collect()
    got = sorted(
        ((r.fact_rank, r.predicate, r.object) for r in out if r.entity == "hub")
    )
    # all predicates are distinct -> equal idf; ties break (predicate, object) asc
    assert got == [(1, "p00", "o00"), (2, "p01", "o01")]
