"""Pure-Python algorithm kernels (no Ray dependency).

Everything here is unit-testable without a Ray session; the ``stages/``
package wraps these kernels into vectorized ``map_batches`` transforms.
"""

from logparser_ray.core.bank import (  # noqa: F401
    FALLTHROUGH_ID,
    FALLTHROUGH_TEMPLATE,
    CompiledBank,
    PatternBank,
    Template,
    template_id_of,
)
from logparser_ray.core.headerdsl import HeaderFormat  # noqa: F401
