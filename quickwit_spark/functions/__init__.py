from quickwit_spark.functions.tokenize import (  # noqa: F401
    tokenize_expr,
    tokenize_py,
    raw_tokenize_py,
    chinese_compatible_tokenize_py,
)
from quickwit_spark.functions.fieldnorm import (  # noqa: F401
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)
