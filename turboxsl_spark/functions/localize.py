"""Localization lookup — the engine's form of the reference's gettext
bridge (``ltr:__l`` / ``ltr:__ln``, /root/reference/src/functions.c:1175-1286).

The reference resolves message keys against a per-language dictionary
and applies plural rules; in Spark that's a map-side dimension join:
the message catalog is a plan-time literal map (or a broadcast join for
big catalogs), and plural selection is a JVM-side CASE expression.
Plural rules themselves are public CLDR/gettext knowledge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def make_catalog_column(catalog: dict[str, str]) -> Column:
    """Plan-time literal map for a small catalog (goes into codegen)."""
    items = []
    for k, v in sorted(catalog.items()):
        items += [F.lit(k), F.lit(v)]
    return F.create_map(*items)


def localize(key: Column | str, catalog: dict[str, str], default: str | None = None) -> Column:
    """``ltr:__l``: message-key → localized string; missing key falls
    back to the key itself (gettext behavior) or an explicit default."""
    key = F.col(key) if isinstance(key, str) else key
    m = make_catalog_column(catalog)
    fb = key if default is None else F.lit(default)
    return F.coalesce(F.element_at(m, key), fb)


def plural_index_en(n: Column) -> Column:
    """English plural rule: 0 → plural, 1 → singular."""
    return F.when(n == 1, 0).otherwise(1)


def plural_index_ru(n: Column) -> Column:
    """Russian 3-form rule (CLDR): 1/x1 (not x11) → 0; 2-4/x2-x4
    (not x12-x14) → 1; else → 2."""
    n10 = n % 10
    n100 = n % 100
    return (
        F.when((n10 == 1) & (n100 != 11), 0)
        .when((n10 >= 2) & (n10 <= 4) & ~((n100 >= 12) & (n100 <= 14)), 1)
        .otherwise(2)
    )


_PLURAL_RULES = {"en": plural_index_en, "ru": plural_index_ru}


def localize_plural(
    key: Column | str,
    n: Column | str,
    forms: dict[str, list[str]],
    lang: str = "en",
) -> Column:
    """``ltr:__ln``: pick the plural form for ``n`` and interpolate
    ``{n}``. ``forms`` maps message key → list of forms (2 for en,
    3 for ru)."""
    key = F.col(key) if isinstance(key, str) else key
    n = (F.col(n) if isinstance(n, str) else n).cast("long")
    idx = _PLURAL_RULES[lang](n)
    max_forms = max(len(v) for v in forms.values())
    arrays = []
    for k, v in sorted(forms.items()):
        padded = list(v) + [v[-1]] * (max_forms - len(v))
        arrays += [F.lit(k), F.array(*[F.lit(x) for x in padded])]
    m = F.create_map(*arrays)
    form = F.element_at(F.element_at(m, key), idx + 1)
    out = F.coalesce(form, key)
    return F.regexp_replace(out, r"\{n\}", n.cast("string"))
