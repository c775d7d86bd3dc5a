"""Source-side star enrichment.

Every reference CT source query inner-joins the fact extract to
``PatientExtract`` and ``Facility`` before anything else
(``LoadSourceCTPatients.sql:7-9``, ``LoadSourceARTPatients.sql:19-21``) —
SQL Server executed that join pre-Spark. Engine-native, it is a shared
operator: broadcast the (small) facility dimension, hash-join the patient
dimension on (PatientId, SiteCode)-style keys.

Scale note: facility is thousands of rows — always broadcast; patient is
millions — let Catalyst pick SMJ/BHJ, and pre-bucket both sides on the
patient key (sources/bucketing.py) to make the nightly join Exchange-free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def star_enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Mapping[str, str], Sequence[str], bool]],
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to each dimension in turn.

    ``dims`` entries are ``(dim_df, on_map, keep_cols, broadcast)`` where
    ``on_map`` maps fact column -> dim column and ``keep_cols`` lists dim
    columns to carry (renamed as-is). Inner joins reproduce the reference's
    source-query semantics (facts without a registered patient/facility are
    dropped before load).
    """
    out = fact
    for dim, on_map, keep_cols, do_broadcast in dims:
        # A fact column that collides (case-insensitively) with a requested
        # dim column is dropped pre-join: the dim's value is authoritative —
        # in the reference's pushed-down SQL these columns are SELECTed from
        # the joined dimension (e.g. P.Gender, F.Code AS SiteCode), never
        # from the fact extract.
        keep_lower = {c.lower() for c in keep_cols}
        collide = [
            c for c in out.columns
            if c.lower() in keep_lower and c not in on_map
        ]
        if collide:
            out = out.drop(*collide)
        # dict.fromkeys dedupes while preserving order — a set literal would
        # randomize output column order across interpreter runs
        d = dim.select(*dict.fromkeys([*on_map.values(), *keep_cols]))
        if do_broadcast:
            d = F.broadcast(d)
        cond = None
        for fc, dc in on_map.items():
            c = out[fc] == d[dc]
            cond = c if cond is None else (cond & c)
        joined = out.join(d, cond, how)
        drop = [dc for dc in on_map.values() if dc not in keep_cols]
        out = joined.drop(*[d[dc] for dc in drop])
    return out


def enrich_patient_facility(
    fact: DataFrame,
    patient: DataFrame,
    facility: DataFrame,
    fact_patient_key: str = "PatientId",
    patient_cols: Sequence[str] = ("PatientPK", "PatientID"),
    facility_cols: Sequence[str] = ("SiteCode", "FacilityName"),
    facility_voided_gate: bool = True,
) -> DataFrame:
    """The concrete reference shape: fact ⋈ PatientExtract ⋈ Facility
    (``LoadSourceCTPatients.sql:7-9``). Patient joins on the fact's patient
    FK; facility joins on the patient's facility FK and is broadcast.

    ``facility_voided_gate``: every reference facility join carries
    ``AND F.Voided = 0`` in its ON clause (``LoadSourceCTPatients.sql:9``,
    ``LoadSourceAdverseEvents.sql:34``) — under an inner join that equals
    filtering the dim before joining, which keeps the broadcast even
    smaller. A voided facility's rows are dropped entirely. Applied only
    when the dim actually carries a Voided column: an extract without it
    cannot be gated (and a NULL Voided row is dropped, matching T-SQL
    ``= 0`` three-valued logic). try_cast: a boolean or varchar bit column
    gates the same as the reference's int bit.

    The fact's FK column is dropped from the output (consumed by the join),
    but the dim's ``PatientID`` must survive. Spark resolves ``drop`` by
    name case-insensitively by default, so dropping the fact's
    ``"PatientId"`` would silently also remove the dim's ``"PatientID"`` —
    the FK is renamed to a collision-free temp name before joining and the
    temp name is dropped instead."""
    if facility_voided_gate and any(c.lower() == "voided" for c in facility.columns):
        facility = facility.filter(F.col("Voided").try_cast("int") == F.lit(0))
    fk_tmp = "__fact_patient_fk"
    return star_enrich(
        fact.withColumnRenamed(fact_patient_key, fk_tmp),
        [
            (patient, {fk_tmp: "Id"}, list(patient_cols) + ["FacilityId"], False),
            (facility, {"FacilityId": "Id"}, list(facility_cols), True),
        ],
    ).drop("FacilityId", fk_tmp)
