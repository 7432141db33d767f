from sous_chef_ray.functions.sqlfns import (  # noqa: F401
    case_when,
    cast,
    coalesce,
    concat_ws,
    date_trunc,
    extract,
    iff,
    nullif,
    nvl,
    zeroifnull,
)
