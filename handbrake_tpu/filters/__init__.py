"""TPU-native filter suite (reference: libhb filters, SURVEY.md §2.4)."""
from .base import (Filter, FilterError, FilterInit, create_filter,  # noqa
                   register, registry)
from .graph import FilterGraph  # noqa: F401
