"""RDF term model used throughout the engine.

The engine is columnar: a triple is a row
``(subject, predicate, object, object_kind, object_lang, object_datatype)``
where ``object_kind`` is ``"iri"`` or ``"literal"`` and ``object`` holds the
canonical lexical form. This module defines the tiny value classes used while
interpreting a workflow (before rows are emitted) plus canonical lexical-form
rules matching the reference's rdflib literals
(reference: kg_text_to_ttl/text_to_turtle_processor.py:2370-2524).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime

XSD = "http://www.w3.org/2001/XMLSchema#"

XSD_INTEGER = XSD + "integer"
XSD_FLOAT = XSD + "float"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_DATETIME = XSD + "dateTime"
XSD_STRING = XSD + "string"

KIND_IRI = "iri"
KIND_LITERAL = "literal"


class Iri(str):
    """An IRI value. Subclasses ``str`` so template/string contexts see the
    IRI text, matching how rdflib ``URIRef`` stringifies in the reference."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Iri({str.__repr__(self)})"


@dataclass(frozen=True, slots=True)
class TypedLiteral:
    """A literal with canonical lexical form + optional lang/datatype."""

    lexical: str
    lang: str | None = None
    datatype: str | None = None

    def __str__(self) -> str:
        return self.lexical


def int_literal(value: int) -> TypedLiteral:
    return TypedLiteral(str(int(value)), datatype=XSD_INTEGER)


def float_literal(value: float) -> TypedLiteral:
    # rdflib uses the repr of the Python float as the lexical form.
    return TypedLiteral(repr(float(value)), datatype=XSD_FLOAT)


def bool_literal(value: bool) -> TypedLiteral:
    return TypedLiteral("true" if value else "false", datatype=XSD_BOOLEAN)


def date_literal(value: date) -> TypedLiteral:
    return TypedLiteral(value.isoformat(), datatype=XSD_DATE)


def datetime_literal(value: datetime) -> TypedLiteral:
    return TypedLiteral(value.isoformat(), datatype=XSD_DATETIME)


def string_literal(value: str, lang: str | None = None) -> TypedLiteral:
    return TypedLiteral(value, lang=lang)


def term_columns(value: Iri | TypedLiteral) -> tuple[str, str, str | None, str | None]:
    """Flatten a term into ``(object, object_kind, object_lang, object_datatype)``."""
    if isinstance(value, Iri):
        return (str(value), KIND_IRI, None, None)
    if isinstance(value, TypedLiteral):
        return (value.lexical, KIND_LITERAL, value.lang, value.datatype)
    raise TypeError(f"not an RDF term: {value!r}")
