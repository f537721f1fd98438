"""Config helpers: the `key=val,flag` argument mini-language.

Capability parity with reference src/configs/common.py:29 (`parse_arg`):
config files take one string argument like `"res=224,img=L/14,runlocal"`;
values are type-coerced by each default's type, bare names become True.
"""

from __future__ import annotations

from typing import Any

import ml_collections


def parse_arg(arg: str | None, **defaults: Any) -> ml_collections.ConfigDict:
    """Parses `"a=1,b=x,flag"` against typed defaults into a ConfigDict."""
    out = ml_collections.ConfigDict(defaults, type_safe=False)
    if not arg:
        return out
    for part in arg.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            out[part] = True
            continue
        key, val = part.split("=", 1)
        key = key.strip()
        val = val.strip().strip("'\"")
        if key not in defaults:
            out[key] = _autocast(val)
            continue
        default = defaults[key]
        if isinstance(default, bool):
            out[key] = val.lower() in ("true", "1", "yes", "t")
        elif isinstance(default, int):
            out[key] = int(val)
        elif isinstance(default, float):
            out[key] = float(val)
        else:
            out[key] = val
    return out


def _autocast(val: str) -> Any:
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    if val.lower() in ("true", "false"):
        return val.lower() == "true"
    return val
