"""Factorization models (explicit and implicit feedback)."""

from spotlight_tpu.factorization.explicit import (  # noqa: F401
    ExplicitFactorizationModel,
)
from spotlight_tpu.factorization.implicit import (  # noqa: F401
    ImplicitFactorizationModel,
)
from spotlight_tpu.factorization.representations import BilinearNet  # noqa: F401
