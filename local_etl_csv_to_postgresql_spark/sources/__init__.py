from .extract import (  # noqa: F401
    ExtractError,
    extract_transactions,
    get_file_info,
    profile_dataframe,
    validate_csv_structure,
)
from .generator import generate_transactions  # noqa: F401
