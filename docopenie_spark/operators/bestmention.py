"""Best-mention canonicalization (SURVEY.md §2.3 T11/T12; reference
tool/bestmention/BestEntityMentionFinder.scala:100-429 — the 330-LoC rule
engine — and the coref propagation in tool/document/DocumentExtractor.scala:116-166).

Rule engine, re-expressed rule-by-rule (semantics, not code):

ORGANIZATION (ref :143-221):
  O-a acronym expansion — an all-caps entity expands to the org candidate
      whose capitalized-word initials spell the acronym; the doc-text
      pattern "Full Name (ACR)" (regex ``\\([^)(]{0,15}ACR[^)(]{0,15}\\)``,
      ref :143) is the anchor case.
  O-b word suffix/prefix containment — entity words are a prefix or
      suffix of a longer candidate's words (ref :191-208).
  O-c char-prefix of a one-word candidate (ref :210-221).
LOCATION (ref :276-362):
  L-a "X, Container" NER-pair candidates (ref :276-294),
  L-b gazetteer containment — "City" → "City, Province" (ref :295-309),
  L-c doc-regex fallback ``(X|x),\\s?([A-Z]\\S+)[\\s.?!,]`` counting
      container candidates and — replicating the reference VERBATIM,
      SURVEY.md A4 — taking the LEAST frequent (sortBy(_._2).head,
      ref :333-335), with state-abbreviation expansion (ref :228-272).
PERSON (ref :375-416):
  P-a word prefix/suffix containment against candidates < 4 words long,
  P-b conservative name-regex doc fallback
      ``(\\.|(\\s[a-z]+\\s))([A-Z]\\w+\\s[A-Z]\\w+)(\\.|(\\s[a-z]+\\s))`` (ref :405).
OTHER: try Org then Loc then Person (ref :113-125).

All candidate lists are sorted by |candidate.offset - entity.offset|
(proximity; ref :129-132); candidate_count = 1/|distinct names| (ref :433).

Execution shape: a cogrouped ``applyInPandas`` on conv_id over
(entities, doc_text) — doc-scoped rules with zero per-row Python; the
gazetteer ships as a broadcast variable (ref loads it as a process
singleton, :611-637).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from .ner import PRONOUNS

# the reference's EXACT personal-pronoun set (DocumentExtractor.scala:140);
# note: contains "his"/"her" but not "she"/"him" — replicated verbatim,
# the XOR propagation gate depends on it
PERSONAL_PRONOUNS = frozenset(
    {"he", "his", "her", "hers", "me", "mine", "we", "our", "us", "i", "you"}
)

# possessive surfaces get "'s"/"'" appended on substitution — the
# reference's fixPossessive (tool/link/Linker.scala:102-120)
POSSESSIVE_PRONOUNS = frozenset(
    {"his", "her", "hers", "its", "their", "our", "my", "your", "mine",
     "theirs", "ours", "yours"}
)


def _possessive_fix(best_col, target_text_col):
    is_poss = F.lower(target_text_col).isin(*sorted(POSSESSIVE_PRONOUNS))
    fixed = F.when(
        best_col.endswith("s"), F.concat(best_col, F.lit("'"))
    ).otherwise(F.concat(best_col, F.lit("'s")))
    return F.when(is_poss, fixed).otherwise(best_col)


def location_casing(s: str) -> str:
    """Title-case each word unless it contains '.' (ref :485-498)."""
    return " ".join(w if "." in w else (w[:1].upper() + w[1:].lower()) for w in s.split())


def _initials(name: str) -> str:
    return "".join(w[0] for w in name.split() if w[:1].isupper())


def _as_index(cands) -> dict[str, list[int]]:
    """Candidates as {name: sorted occurrence offsets} — distinct names
    are few even when occurrences are many (the hot-conversation case),
    so every rule scan below is O(#distinct names · log #occurrences)."""
    if isinstance(cands, dict):
        return cands
    idx: dict[str, list[int]] = {}
    for n, o in cands:
        idx.setdefault(n, []).append(int(o))
    for v in idx.values():
        v.sort()
    return idx


def _nearest_occ(offs: list[int], off: int) -> tuple[int, int]:
    """(distance, occurrence_offset) of the occurrence closest to off."""
    from bisect import bisect_left

    i = bisect_left(offs, off)
    best = None
    for j in (i - 1, i):
        if 0 <= j < len(offs):
            c = (abs(offs[j] - off), offs[j])
            if best is None or c < best:
                best = c
    return best


def _pick(matching: dict[str, list[int]], off: int):
    """Nearest-occurrence proximity selection over matching names —
    reproduces the reference's sortBy(|cand.offset - entity.offset|) +
    head (ref :129-132); count = 1/|distinct names| (ref :433).

    The chosen NAME depends on the entity's offset only when more than
    one candidate name matches — resolve_conversation memoizes the
    single-candidate case per (type, name), which collapses the hot
    conversation's 400k-entity loop to ~|distinct names| rule runs."""
    if not matching:
        return None
    best = min(
        ((_nearest_occ(offs, off), n) for n, offs in matching.items()),
        key=lambda t: (t[0][0], t[0][1], t[1]),
    )
    (dist, occ), n = best
    return n, (n, occ), 1.0 / len(matching), matching


def _offset_independent(res) -> bool:
    """True when a rule result cannot vary with the entity's offset:
    no candidate occurrence involved, or candidate_count == 1.0 (a single
    matching name — the nearest occurrence may differ but the resolved
    NAME and kind cannot)."""
    return res is None or res[1] is None or res[2] == 1.0


def _matching_of(res):
    """The matching-candidates dict a _pick-based result saw (4th slot);
    regex-fallback results have no candidate set."""
    return res[3] if res is not None and len(res) > 3 else None


def best_org(name: str, off: int, org_cands, doc: str, memo: dict | None = None):
    """O-a/O-b/O-c; returns (best_name, (cand_name, cand_off)|None, count)."""
    idx = _as_index(org_cands)
    words = name.split()
    # O-a: acronym expansion
    if len(words) == 1 and name.isupper() and len(name) >= 2:
        matching = {n: o for n, o in idx.items() if n != name and _initials(n) == name}
        if matching:
            return _pick(matching, off)
        # doc anchor "… Full Name (ACR) …" — name-dependent only: memoize
        key = ("org_regex", name)
        if memo is None or key not in (memo or {}):
            m = re.search(
                r"((?:[A-Z][\w.&-]*\s+){1,6})\(\s*" + re.escape(name) + r"\s*\)", doc
            )
            full = m.group(1).strip() if m else None
            res = (full, None, 1.0) if full and _initials(full) == name else None
            if memo is not None:
                memo[key] = res
        else:
            res = memo[key]
        if res:
            return res
    # O-b: word prefix/suffix containment
    matching = {}
    for n, o in idx.items():
        cw = n.split()
        if len(cw) > len(words) and (cw[: len(words)] == words or cw[-len(words):] == words):
            matching[n] = o
    if matching:
        return _pick(matching, off)
    # O-c: char-prefix of one-word candidate
    if len(words) == 1:
        matching = {
            n: o for n, o in idx.items()
            if " " not in n and len(n) > len(name) and n.startswith(name)
        }
        if matching:
            return _pick(matching, off)
    return None


def best_loc(name: str, off: int, loc_cands, doc: str,
             gaz_container: dict, abbrev_state: dict, memo: dict | None = None):
    idx = _as_index(loc_cands)
    words = name.split()
    if len(words) != 1:
        return None
    # L-a: a sibling NER location already of the form "name, Container"
    matching = {n: o for n, o in idx.items() if n.startswith(name + ",")}
    if matching:
        return _pick(matching, off)
    # L-b: gazetteer containment
    cont = gaz_container.get(name)
    if cont:
        return f"{name}, {location_casing(cont)}", None, 1.0
    # L-c: doc-regex container counting — LEAST frequent, verbatim A4;
    # name-dependent only → memoized per conversation
    key = ("loc_regex", name)
    if memo is not None and key in memo:
        return memo[key]
    pat = re.compile(
        r"(?:%s|%s),\s?([A-Z]\S+?)[\s.?!,]" % (re.escape(name), re.escape(name.lower()))
    )
    counts: dict[str, int] = {}
    for m in pat.finditer(doc):
        c = m.group(1).rstrip(".,!?")
        c = abbrev_state.get(c, c)
        counts[c] = counts.get(c, 0) + 1
    res = None
    if counts:
        least = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))[0][0]
        res = (f"{name}, {location_casing(least)}", None, 1.0 / len(counts))
    if memo is not None:
        memo[key] = res
    return res


def best_person(name: str, off: int, per_cands, doc: str, memo: dict | None = None):
    idx = _as_index(per_cands)
    words = name.split()
    matching = {}
    for n, o in idx.items():
        cw = n.split()
        if len(words) < len(cw) < 4 and (cw[: len(words)] == words or cw[-len(words):] == words):
            matching[n] = o
    if matching:
        return _pick(matching, off)
    # P-b: conservative name-regex fallback (ref :405); memoized per name
    if len(words) == 1:
        key = ("per_regex", name)
        if memo is not None and key in memo:
            return memo[key]
        res = None
        for m in re.finditer(r"(?:\.|\s[a-z]+\s)([A-Z]\w+\s[A-Z]\w+)(?=\.|\s[a-z]+\s)", doc):
            full = m.group(1)
            if words[0] in full.split() and full != name:
                res = (full, None, 0.5)
                break
        if memo is not None:
            memo[key] = res
        return res
    return None


def resolve_conversation(ents: pd.DataFrame, doc: str,
                         gaz_container: dict, abbrev_state: dict) -> list[tuple]:
    """All entities of one conversation → best-mention rows (T11).

    Candidates are indexed once per conversation as {name: sorted offs};
    doc-regex fallbacks memoize per (rule, name) — together these keep the
    hot conversation (10% of all turns in one group) near-linear instead
    of O(entities²)."""
    conv_id = ents["conv_id"].iloc[0]
    by_type: dict[str, dict[str, list[int]]] = {}
    for r in ents.itertuples():
        by_type.setdefault(r.entity_type, {}).setdefault(r.name, []).append(int(r.offset))
    for d in by_type.values():
        for v in d.values():
            v.sort()
    memo: dict = {}
    full_memo: dict = {}  # (typ, name) → res, when offset-independent

    def _resolve(name: str, off: int, typ: str):
        if typ == "ORGANIZATION":
            return best_org(name, off, by_type.get("ORGANIZATION", {}), doc, memo)
        if typ == "LOCATION":
            return best_loc(name, off, by_type.get("LOCATION", {}), doc,
                            gaz_container, abbrev_state, memo)
        if typ == "PERSON":
            return best_person(name, off, by_type.get("PERSON", {}), doc, memo)
        # OTHER: org → loc → person cascade (ref :113-125)
        return (
            best_org(name, off, by_type.get("ORGANIZATION", {}), doc, memo)
            or best_loc(name, off, by_type.get("LOCATION", {}), doc,
                        gaz_container, abbrev_state, memo)
            or best_person(name, off, by_type.get("PERSON", {}), doc, memo)
        )

    rows = []
    for r in ents.itertuples():
        name, off, typ = r.name, int(r.offset), r.entity_type
        fkey = (typ, name)
        if fkey in full_memo:
            res = full_memo[fkey]
        else:
            res = _resolve(name, off, typ)
            # memoize only when the resolved name cannot vary with offset
            # (single matching candidate); best_entity's occurrence offset
            # is metadata and may pin to this entity's nearest occurrence
            if _offset_independent(res):
                full_memo[fkey] = res
        target = {"text": r.text, "offset": off, "name": name, "entity_type": typ}
        if res is None or res[0] == name:
            rows.append((conv_id, "identity", target, name, None, 1.0, None))
        else:
            best_name, cand, count = res[0], res[1], res[2]
            best_entity = None
            kind = "full"
            if cand is not None:
                best_entity = {"text": cand[0], "offset": cand[1],
                               "name": cand[0], "entity_type": typ}
            rows.append((conv_id, kind, target, best_name, best_entity, count, None))
    return rows


def best_mentions_python(entities: DataFrame, docs: DataFrame,
                         gazetteer_rows: list[tuple]) -> DataFrame:
    """Per-occurrence cogrouped variant (parity reference): every entity
    occurrence flows through Python. Kept for the parity test."""
    spark = entities.sparkSession
    gaz_container = {r[0]: r[2] for r in gazetteer_rows if r[2]}
    abbrev_state = {r[4]: r[0] for r in gazetteer_rows if len(r) > 4 and r[4]}
    b_gaz = spark.sparkContext.broadcast((gaz_container, abbrev_state))

    def run(ents: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "kind", "target", "best_mention", "best_entity",
                "candidate_count", "cluster_id"]
        if ents.empty or dpdf.empty:
            return pd.DataFrame([], columns=cols)
        gc, ab = b_gaz.value
        rows = resolve_conversation(ents, dpdf["doc_text"].iloc[0], gc, ab)
        return pd.DataFrame(rows, columns=cols)

    return (
        entities.groupBy("conv_id")
        .cogroup(docs.groupBy("conv_id"))
        .applyInPandas(run, schema=schemas.BEST_MENTIONS)
    )


_RESOLVED = (
    "conv_id string, entity_type string, name string, kind string, "
    "best_mention string, "
    "best_entity struct<text:string,offset:bigint,name:string,entity_type:string>, "
    "candidate_count double, dep boolean, "
    "matches array<struct<name:string,offs:array<bigint>>>"
)


def best_mentions(entities: DataFrame, docs: DataFrame,
                  gazetteer_rows: list[tuple]) -> DataFrame:
    """(ENTITIES, (conv_id, doc_text)) → BEST_MENTIONS.

    Scale shape: the rule engine runs in Python ONCE PER DISTINCT
    (conv_id, entity_type, name) — ~30 rows per conversation even for the
    hot one — and the per-occurrence fan-out happens as a JVM hash join
    back onto the entities table. Occurrence rows never cross the Arrow
    boundary (the per-occurrence variant measured 40.8s at 1M turns;
    distinct names are ~0.02% of occurrences on the skewed corpus).

    Offset-dependent resolutions (more than one matching candidate name —
    proximity decides per occurrence, ref :129-132) are detected in the
    distinct pass and re-resolved per occurrence in a second, tiny
    cogroup restricted to those names; such resolutions never take the
    doc-regex fallbacks, so the second pass ships no doc text.
    """
    spark = entities.sparkSession
    gaz_container = {r[0]: r[2] for r in gazetteer_rows if r[2]}
    abbrev_state = {r[4]: r[0] for r in gazetteer_rows if len(r) > 4 and r[4]}
    b_gaz = spark.sparkContext.broadcast((gaz_container, abbrev_state))

    distinct = entities.groupBy("conv_id", "entity_type", "name").agg(
        F.sort_array(F.collect_list("offset")).alias("offs"),
        F.min("offset").alias("rep_off"),
    )

    def _by_type(names_pdf: pd.DataFrame) -> dict:
        by_type: dict[str, dict[str, list[int]]] = {}
        for r in names_pdf.itertuples():
            by_type.setdefault(r.entity_type, {})[r.name] = [int(o) for o in r.offs]
        return by_type

    def _res_row(name, typ, off, by_type, doc, gc, ab, memo):
        if typ == "ORGANIZATION":
            return best_org(name, off, by_type.get("ORGANIZATION", {}), doc, memo)
        if typ == "LOCATION":
            return best_loc(name, off, by_type.get("LOCATION", {}), doc, gc, ab, memo)
        if typ == "PERSON":
            return best_person(name, off, by_type.get("PERSON", {}), doc, memo)
        return (
            best_org(name, off, by_type.get("ORGANIZATION", {}), doc, memo)
            or best_loc(name, off, by_type.get("LOCATION", {}), doc, gc, ab, memo)
            or best_person(name, off, by_type.get("PERSON", {}), doc, memo)
        )

    def _emit(conv_id, name, typ, res):
        if res is None or res[0] == name:
            return (conv_id, typ, name, "identity", name, None, 1.0, False, None)
        best_name, cand, count = res[0], res[1], res[2]
        be = None
        if cand is not None:
            be = {"text": cand[0], "offset": cand[1], "name": cand[0], "entity_type": typ}
        dep = cand is not None and count < 1.0
        matches = None
        if dep:
            m = _matching_of(res) or {}
            matches = [{"name": n, "offs": offs} for n, offs in sorted(m.items())]
        return (conv_id, typ, name, "full", best_name, be, count, dep, matches)

    def resolve_names(names_pdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "entity_type", "name", "kind", "best_mention",
                "best_entity", "candidate_count", "dep", "matches"]
        if names_pdf.empty or dpdf.empty:
            return pd.DataFrame([], columns=cols)
        gc, ab = b_gaz.value
        doc = dpdf["doc_text"].iloc[0]
        conv_id = names_pdf["conv_id"].iloc[0]
        by_type = _by_type(names_pdf)
        memo: dict = {}
        rows = [
            _emit(conv_id, r.name, r.entity_type,
                  _res_row(r.name, r.entity_type, int(r.rep_off), by_type, doc, gc, ab, memo))
            for r in names_pdf.itertuples()
        ]
        return pd.DataFrame(rows, columns=cols)

    resolved = (
        distinct.groupBy("conv_id")
        .cogroup(docs.groupBy("conv_id"))
        .applyInPandas(resolve_names, schema=_RESOLVED)
    )

    joined = entities.join(resolved, ["conv_id", "entity_type", "name"], "left")

    target = F.struct(
        F.col("text"), F.col("offset"), F.col("name"), F.col("entity_type")
    ).cast(schemas.ENTITY_REF).alias("target")

    independent = joined.where(~F.coalesce("dep", F.lit(False))).select(
        "conv_id",
        F.coalesce("kind", F.lit("identity")).alias("kind"),
        target,
        F.coalesce("best_mention", F.col("name")).alias("best_mention"),
        F.col("best_entity").cast(schemas.ENTITY_REF).alias("best_entity"),
        F.coalesce("candidate_count", F.lit(1.0)).alias("candidate_count"),
        F.lit(None).cast("int").alias("cluster_id"),
    )

    # second pass — per-occurrence proximity for multi-candidate names,
    # FULLY NATIVE: the matching-candidate set rides along as an array
    # column and nested array_min(transform(...)) reproduces _pick's
    # exact tie order (distance, occurrence offset, name) per occurrence.
    # No explode, no Python, no self-join.
    dep = joined.where(F.coalesce("dep", F.lit(False)))

    inner = lambda m: F.array_min(
        F.transform(
            m["offs"],
            lambda o: F.struct(
                F.abs(o - F.col("offset")).alias("d"), o.alias("occ")
            ),
        )
    )
    best = F.array_min(
        F.transform(
            "matches",
            lambda m: F.struct(
                inner(m)["d"].alias("d"),
                inner(m)["occ"].alias("occ"),
                m["name"].alias("n"),
            ),
        )
    )
    dep_rows = dep.select(
        "conv_id",
        F.lit("full").alias("kind"),
        target,
        best["n"].alias("best_mention"),
        F.struct(
            best["n"].alias("text"), best["occ"].alias("offset"),
            best["n"].alias("name"), F.col("entity_type"),
        ).cast(schemas.ENTITY_REF).alias("best_entity"),
        (F.lit(1.0) / F.size("matches")).alias("candidate_count"),
        F.lit(None).cast("int").alias("cluster_id"),
    )
    return independent.unionByName(dep_rows)


def display_filter(bems: DataFrame) -> DataFrame:
    """P12 (repr/bestmention/BestMention.scala:57-59): only non-identity
    mentions whose best form differs from the surface are displayable."""
    return bems.where(
        (F.col("kind") != "identity") & (F.col("best_mention") != F.col("target.text"))
    )


# --------------------------------------------------------------- T12

def _pronoun_gate(text_col, type_col):
    """The reference's XOR gate (DocumentExtractor.scala:143-145):
    propagate iff personalPronouns(text) XOR (entity_type != PERSON)."""
    is_personal = F.lower(text_col).isin(*PERSONAL_PRONOUNS)
    not_person = type_col != F.lit("PERSON")
    return (is_personal & ~not_person) | (~is_personal & not_person)


def expand_with_coref(bems: DataFrame, clusters: DataFrame,
                      links: DataFrame | None = None) -> DataFrame:
    """T12: per cluster, if exactly one distinct link (else exactly one
    distinct best mention) lands on the cluster's mentions, propagate it
    to the cluster's PRONOUN mentions through the XOR gate. Expressed as
    Spark joins + grouped aggregation (SURVEY.md J1/J2/A1) — the
    reference's O(M×L) nested loops become hash joins on (conv_id, offset).
    """
    m = clusters.select(
        "conv_id", "cluster_id", F.explode("mentions").alias("m")
    ).select("conv_id", "cluster_id", F.col("m.text").alias("m_text"),
             F.col("m.offset").alias("m_offset"))

    is_pron = F.lower(F.col("m_text")).isin(*sorted(PRONOUNS))
    pron_mentions = m.where(is_pron)

    new_rows = []

    if links is not None:
        # the reference maps links onto clusters by link.offset == m.offset
        # (DocumentExtractor.scala:119-121) against Stanford mentions that
        # INCLUDE determiners; our mentions are NNP runs without them, so
        # the aligned key is the cleaned-arg offset (first retained char)
        l = links.select(
            F.col("conv_id").alias("l_conv"), F.col("clean_offset").alias("l_off"),
            F.col("name").alias("l_name"), F.col("id").alias("l_id"),
            F.col("types").alias("l_types"),
        )
        lic = m.join(
            l, (m.conv_id == l.l_conv) & (m.m_offset == l.l_off)
        ).select(m.conv_id, "cluster_id", "l_name", "l_id", "l_types")
        uniq = (
            lic.groupBy("conv_id", "cluster_id")
            .agg(F.countDistinct("l_id").alias("n"),
                 F.min(F.struct("l_id", "l_name", "l_types")).alias("l"))
            .where(F.col("n") == 1)
        )
        person_link = F.exists(F.col("l.l_types"), lambda t: t == F.lit("person"))
        link_type = F.when(person_link, F.lit("PERSON")).otherwise(F.lit("OTHER"))
        new_rows.append(
            pron_mentions.join(uniq, ["conv_id", "cluster_id"])
            .where(_pronoun_gate(F.col("m_text"), link_type))
            .select(
                "conv_id",
                F.lit("coref_link").alias("kind"),
                F.struct(
                    F.col("m_text").alias("text"), F.col("m_offset").alias("offset"),
                    F.col("m_text").alias("name"), link_type.alias("entity_type"),
                ).alias("target"),
                _possessive_fix(F.col("l.l_name"), F.col("m_text")).alias("best_mention"),
                F.lit(None).cast(schemas.ENTITY_REF).alias("best_entity"),
                F.lit(1.0).alias("candidate_count"),
                F.col("cluster_id"),
            )
        )
        linked_clusters = uniq.select("conv_id", "cluster_id")
    else:
        linked_clusters = None

    b = bems.where(F.col("kind").isin("identity", "full")).select(
        F.col("conv_id").alias("b_conv"), F.col("target.offset").alias("b_off"),
        "kind", "target", "best_mention", "best_entity", "candidate_count",
    )
    bic = m.join(
        b, (m.conv_id == b.b_conv) & (m.m_offset == b.b_off)
    ).select(m.conv_id, "cluster_id", "kind", "target", "best_mention",
             "best_entity", "candidate_count")
    uniq_b = (
        bic.groupBy("conv_id", "cluster_id")
        .agg(
            F.countDistinct("best_mention").alias("n"),
            F.min(F.struct("best_mention", "kind", "target", "best_entity",
                           "candidate_count")).alias("b"),
        )
        .where(F.col("n") == 1)
    )
    if linked_clusters is not None:
        uniq_b = uniq_b.join(linked_clusters, ["conv_id", "cluster_id"], "left_anti")

    coref_kind = (
        F.when(F.col("b.kind") == "identity", F.lit("coref_identity"))
        .when(F.col("b.best_entity").isNotNull(), F.lit("coref_full"))
        .otherwise(F.lit("coref"))
    )
    new_rows.append(
        pron_mentions.join(uniq_b, ["conv_id", "cluster_id"])
        .where(_pronoun_gate(F.col("m_text"), F.col("b.target.entity_type")))
        .select(
            "conv_id",
            coref_kind.alias("kind"),
            F.struct(
                F.col("m_text").alias("text"), F.col("m_offset").alias("offset"),
                F.col("m_text").alias("name"),
                F.col("b.target.entity_type").alias("entity_type"),
            ).alias("target"),
            _possessive_fix(
                F.when(F.col("b.kind") == "identity", F.col("b.target.name"))
                .otherwise(F.col("b.best_mention")),
                F.col("m_text"),
            ).alias("best_mention"),
            F.col("b.best_entity").alias("best_entity"),
            F.col("b.candidate_count").alias("candidate_count"),
            F.col("cluster_id"),
        )
    )

    out = bems
    for df in new_rows:
        out = out.unionByName(df)
    return out
