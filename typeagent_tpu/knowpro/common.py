"""Shared predicates (parity: reference knowpro/common.py)."""

from .interfaces import SearchTerm


def is_search_term_wildcard(search_term: SearchTerm) -> bool:
    """A '*' search term matches any value."""
    return search_term.term.text == "*"
