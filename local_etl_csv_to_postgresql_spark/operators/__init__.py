from .standardize import (  # noqa: F401
    python_title,
    standardize_category,
    standardize_merchant,
    standardize_payment_method,
)
from .dedup import keep_first_dedup  # noqa: F401
from .validate import ValidationResult, validate_transactions  # noqa: F401
from .dates import with_date_attributes, build_dim_date  # noqa: F401
from .dimensions import build_dimensions, prepare_fact  # noqa: F401
from .transform import TransformResult, transform_transactions  # noqa: F401
