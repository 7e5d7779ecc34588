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
    """Two-form rule ``n != 1``: 1 → singular (0), else plural (1).

    The reference uses this identical rule for en, et, de, es, az, uz
    and tr (/root/reference/src/localization.c:47-85)."""
    return F.when(n == 1, 0).otherwise(1)


def plural_index_ru(n: Column) -> Column:
    """East-Slavic 3-form rule (ru and uk,
    /root/reference/src/localization.c:37-45): x1 (not x11) → 0;
    x2-x4 outside the teens (``n%100 < 10 or >= 20``) → 1; else → 2."""
    n10 = n % 10
    n100 = n % 100
    return (
        F.when((n10 == 1) & (n100 != 11), 0)
        .when((n10 >= 2) & (n10 <= 4) & ((n100 < 10) | (n100 >= 20)), 1)
        .otherwise(2)
    )


def plural_index_pl(n: Column) -> Column:
    """Polish 3-form rule (/root/reference/src/localization.c:52-55).

    Diverges from ru at the FIRST clause: exactly ``n == 1`` is
    singular (not every x1 — so 21 is form 2 in pl but form 0 in ru);
    the 2-4-outside-teens clause matches ru."""
    n10 = n % 10
    n100 = n % 100
    return (
        F.when(n == 1, 0)
        .when((n10 >= 2) & (n10 <= 4) & ((n100 < 10) | (n100 >= 20)), 1)
        .otherwise(2)
    )


# Language → rule table, mirroring the reference's full set of 10
# (/root/reference/src/localization.c:37-86). Seven languages share the
# two-form n != 1 rule; ru/uk share the East-Slavic 3-form; pl has its
# own exact-1 variant.
_PLURAL_RULES = {
    "en": plural_index_en,
    "et": plural_index_en,
    "de": plural_index_en,
    "es": plural_index_en,
    "az": plural_index_en,
    "uz": plural_index_en,
    "tr": plural_index_en,
    "ru": plural_index_ru,
    "uk": plural_index_ru,
    "pl": plural_index_pl,
}


def localize_plural(
    key: Column | str,
    n: Column | str,
    forms: dict[str, list[str]],
    lang: str = "en",
) -> Column:
    """``ltr:__ln``: pick the plural form for ``n`` and interpolate
    ``{n}``. ``forms`` maps message key → list of forms (2 for the
    two-form languages en/et/de/es/az/uz/tr, 3 for ru/uk/pl); ``lang``
    selects the rule from ``_PLURAL_RULES`` (the reference's full set,
    /root/reference/src/localization.c:37-86)."""
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
