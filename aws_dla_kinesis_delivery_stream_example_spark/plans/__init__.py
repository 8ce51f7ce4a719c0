from .catalog import CATALOG_EXTENT, REGISTRY, QuerySpec, all_specs, query

# Importing the plan modules populates REGISTRY.
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import sql_api  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import curation2  # noqa: E402,F401
from . import curation3  # noqa: E402,F401
from . import curation4  # noqa: E402,F401
from . import curation5  # noqa: E402,F401
from . import curation6  # noqa: E402,F401
from . import curation7  # noqa: E402,F401
from . import curation8  # noqa: E402,F401
from . import curation9  # noqa: E402,F401
from . import curation10  # noqa: E402,F401
from . import curation11  # noqa: E402,F401
from . import curation12  # noqa: E402,F401
from . import curation13  # noqa: E402,F401
from . import curation14  # noqa: E402,F401
from . import curation15  # noqa: E402,F401
from . import curation16  # noqa: E402,F401
from . import curation17  # noqa: E402,F401
from . import curation18  # noqa: E402,F401
from . import curation19  # noqa: E402,F401
from . import curation20  # noqa: E402,F401
from . import curation21  # noqa: E402,F401
from . import curation22  # noqa: E402,F401
from . import delivery  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import quality  # noqa: E402,F401

__all__ = ["CATALOG_EXTENT", "REGISTRY", "QuerySpec", "all_specs", "query"]
