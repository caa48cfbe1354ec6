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


def _proximity(cands: list[tuple[str, int]], off: int) -> list[tuple[str, int]]:
    return sorted(cands, key=lambda c: (abs(c[1] - off), c[1]))


def _candidate_count(cands: list[tuple[str, int]]) -> float:
    names = {c[0] for c in cands}
    return 1.0 / len(names) if names else 1.0


def best_org(name: str, off: int, org_cands: list[tuple[str, int]], doc: str):
    """O-a/O-b/O-c; returns (best_name, (cand_name, cand_off)|None, count)."""
    words = name.split()
    # O-a: acronym expansion
    if len(words) == 1 and name.isupper() and len(name) >= 2:
        cands = [(n, o) for n, o in org_cands if _initials(n) == name and n != name]
        # doc anchor "… Full Name (ACR) …" confirms but candidates suffice
        if cands:
            cands = _proximity(cands, off)
            return cands[0][0], cands[0], _candidate_count(cands)
        m = re.search(
            r"((?:[A-Z][\w.&-]*\s+){1,6})\(\s*" + re.escape(name) + r"\s*\)", doc
        )
        if m:
            full = m.group(1).strip()
            if _initials(full) == name:
                return full, None, 1.0
    # O-b: word prefix/suffix containment
    cands = []
    for n, o in org_cands:
        cw = n.split()
        if len(cw) > len(words) and (cw[: len(words)] == words or cw[-len(words):] == words):
            cands.append((n, o))
    if cands:
        cands = _proximity(cands, off)
        return cands[0][0], cands[0], _candidate_count(cands)
    # O-c: char-prefix of one-word candidate
    if len(words) == 1:
        cands = [
            (n, o) for n, o in org_cands
            if " " not in n and len(n) > len(name) and n.startswith(name)
        ]
        if cands:
            cands = _proximity(cands, off)
            return cands[0][0], cands[0], _candidate_count(cands)
    return None


def best_loc(name: str, off: int, loc_cands: list[tuple[str, int]], doc: str,
             gaz_container: dict, abbrev_state: dict):
    words = name.split()
    if len(words) != 1:
        return None
    # L-a: a sibling NER location already of the form "name, Container"
    cands = [(n, o) for n, o in loc_cands if n.startswith(name + ",")]
    if cands:
        cands = _proximity(cands, off)
        return cands[0][0], cands[0], _candidate_count(cands)
    # L-b: gazetteer containment
    cont = gaz_container.get(name)
    if cont:
        return f"{name}, {location_casing(cont)}", None, 1.0
    # L-c: doc-regex container counting — LEAST frequent, verbatim A4
    pat = re.compile(
        r"(?:%s|%s),\s?([A-Z]\S+?)[\s.?!,]" % (re.escape(name), re.escape(name.lower()))
    )
    counts: dict[str, int] = {}
    for m in pat.finditer(doc):
        c = m.group(1).rstrip(".,!?")
        c = abbrev_state.get(c, c)
        counts[c] = counts.get(c, 0) + 1
    if counts:
        least = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))[0][0]
        return f"{name}, {location_casing(least)}", None, 1.0 / len(counts)
    return None


def best_person(name: str, off: int, per_cands: list[tuple[str, int]], doc: str):
    words = name.split()
    cands = []
    for n, o in per_cands:
        cw = n.split()
        if len(words) < len(cw) < 4 and (cw[: len(words)] == words or cw[-len(words):] == words):
            cands.append((n, o))
    if cands:
        cands = _proximity(cands, off)
        return cands[0][0], cands[0], _candidate_count(cands)
    # P-b: conservative name-regex fallback (ref :405)
    if len(words) == 1:
        for m in re.finditer(r"(?:\.|\s[a-z]+\s)([A-Z]\w+\s[A-Z]\w+)(?=\.|\s[a-z]+\s)", doc):
            full = m.group(1)
            fw = full.split()
            if words[0] in fw and full != name:
                return full, None, 0.5
    return None


def resolve_conversation(ents: pd.DataFrame, doc: str,
                         gaz_container: dict, abbrev_state: dict) -> list[tuple]:
    """All entities of one conversation → best-mention rows (T11)."""
    conv_id = ents["conv_id"].iloc[0]
    by_type: dict[str, list[tuple[str, int]]] = {}
    for r in ents.itertuples():
        by_type.setdefault(r.entity_type, []).append((r.name, int(r.offset)))

    rows = []
    for r in ents.itertuples():
        name, off, typ = r.name, int(r.offset), r.entity_type
        res = None
        if typ == "ORGANIZATION":
            res = best_org(name, off, by_type.get("ORGANIZATION", []), doc)
        elif typ == "LOCATION":
            res = best_loc(name, off, by_type.get("LOCATION", []), doc,
                           gaz_container, abbrev_state)
        elif typ == "PERSON":
            res = best_person(name, off, by_type.get("PERSON", []), doc)
        else:  # OTHER: org → loc → person cascade (ref :113-125)
            res = (
                best_org(name, off, by_type.get("ORGANIZATION", []), doc)
                or best_loc(name, off, by_type.get("LOCATION", []), doc,
                            gaz_container, abbrev_state)
                or best_person(name, off, by_type.get("PERSON", []), doc)
            )
        target = {"text": r.text, "offset": off, "name": name, "entity_type": typ}
        if res is None or res[0] == name:
            rows.append((conv_id, "identity", target, name, None, 1.0, None))
        else:
            best_name, cand, count = res
            best_entity = None
            kind = "full"
            if cand is not None:
                best_entity = {"text": cand[0], "offset": cand[1],
                               "name": cand[0], "entity_type": typ}
            rows.append((conv_id, kind, target, best_name, best_entity, count, None))
    return rows


def best_mentions(entities: DataFrame, docs: DataFrame,
                  gazetteer_rows: list[tuple]) -> DataFrame:
    """(ENTITIES, (conv_id, doc_text)) → BEST_MENTIONS via cogrouped
    applyInPandas on conv_id (one shuffle, doc-scoped rules)."""
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

    if links is not None and not links.isEmpty():
        l = links.select(
            F.col("conv_id").alias("l_conv"), F.col("offset").alias("l_off"),
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
