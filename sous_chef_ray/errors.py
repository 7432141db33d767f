"""Error model.

Mirrors the reference's error surface (reference: src/sous_chef/errors.py:4-31,
validators.py:7-10) without copying it: a structured validation-error record
with a machine-readable code, plus a base exception that serializes for CI.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, Optional


class ValidationErrorCode(str, Enum):
    MISSING_REQUIRED = "missing_required"
    UNKNOWN_FIELD = "unknown_field"
    INVALID_TYPE = "invalid_type"
    INVALID_SQL = "invalid_sql"
    UNSUPPORTED = "unsupported"
    DANGLING_REFERENCE = "dangling_reference"


@dataclass
class ValidationError:
    path: str
    code: ValidationErrorCode
    message: str
    context: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "path": self.path,
            "code": self.code.value,
            "message": self.message,
            "context": dict(self.context),
        }


class SousChefError(Exception):
    """Base exception; carries optional structured errors for CI output."""

    def __init__(self, message: str, errors: Optional[list] = None):
        super().__init__(message)
        self.message = message
        self.errors = list(errors or [])

    def to_dict(self) -> Dict[str, Any]:
        return {
            "message": self.message,
            "errors": [
                e.to_dict() if isinstance(e, ValidationError) else str(e)
                for e in self.errors
            ],
        }
