"""Config + SQL validators (boolean flavor) with metadata-tag rules.

Behavioral parity with the reference's validators (reference:
src/sous_chef/validators.py — SQLValidator :18-141, ConfigValidator
:167-295); error strings are pinned by tests (e.g. "missing required
tags", "unsupported tags found", feature-service messages). Written from
scratch; the SQL cleaner uses an explicit scanner state rather than the
reference's char loop, with identical observable behavior.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Set

import yaml

AGGREGATE_FUNCTIONS = {"COUNT", "SUM", "AVG", "MAX", "MIN", "ARRAY_AGG", "COLLECT_LIST"}
WINDOW_FUNCTIONS = {"RANK", "ROW_NUMBER", "LAG", "LEAD", "FIRST_VALUE", "LAST_VALUE", "AVG", "SUM"}

_RULES_PATH = Path(__file__).parent / "config" / "metadata_rules.yaml"


def _strip_comment(line: str) -> str:
    return line[: line.index("--")] if "--" in line else line


def _flatten_sql(query: str) -> str:
    """Join lines outside parentheses, dropping -- comments per line."""
    merged: List[str] = []
    buf: List[str] = []
    depth = 0
    for ch in query:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "\n" and depth == 0:
            piece = _strip_comment("".join(buf)).strip()
            if piece:
                merged.append(piece)
            buf = []
        else:
            buf.append(ch)
    piece = _strip_comment("".join(buf)).strip()
    if piece:
        merged.append(piece)
    return " ".join(merged).strip()


def _find_from(clean_upper: str) -> int:
    """Position of the FROM clause, skipping EXTRACT(x FROM y)."""
    in_extract = False
    i = 0
    while i < len(clean_upper):
        if clean_upper[i:].startswith("EXTRACT"):
            in_extract = True
        elif clean_upper[i:].startswith("FROM") and not in_extract:
            return i
        elif clean_upper[i] == ")":
            in_extract = False
        i += 1
    return -1


def _split_top_level(text: str) -> List[str]:
    cols: List[str] = []
    buf: List[str] = []
    depth = 0
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            if buf:
                cols.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        cols.append("".join(buf).strip())
    return cols


class SQLValidator:
    """Boolean SQL validator: every non-trivial SELECT expression must
    carry an alias; bare and qualified columns pass as-is."""

    AGGREGATE_FUNCTIONS = AGGREGATE_FUNCTIONS
    WINDOW_FUNCTIONS = WINDOW_FUNCTIONS

    @classmethod
    def validate_sql(cls, query: str) -> bool:
        try:
            clean = _flatten_sql(query)
            if not clean.upper().startswith("SELECT"):
                return False
            from_pos = _find_from(clean.upper())
            if from_pos == -1:
                return False
            select_part = clean[6:from_pos].strip()
            if not select_part:
                return False
            for col in _split_top_level(select_part):
                col = col.strip().upper()
                if not col or " AS " in col or col.isalnum():
                    continue
                if "." in col and not col.endswith(".") and len(col.split(".")) == 2:
                    continue
                if (
                    col.endswith(".")
                    or "(" in col
                    or any(op in col for op in "+-*/")
                    or "CASE" in col
                    or "EXTRACT" in col
                ):
                    return False
            return True
        except Exception:
            return False

    @classmethod
    def validate_config(cls, config: Dict) -> bool:
        if not all(k in config for k in ("query", "timestamp_field", "database")):
            return False
        return cls.validate_sql(config["query"])


class ConfigValidator:
    """YAML feature-config validator with metadata-tag rules.

    required = global ∪ context; allowed = optional.global ∪ every
    required section. Tag errors keep the reference's exact format.
    """

    def __init__(self, metadata_rules: Optional[Dict] = None):
        if metadata_rules:
            self.metadata_rules = metadata_rules
        else:
            with open(_RULES_PATH) as f:
                self.metadata_rules = yaml.safe_load(f)["metadata_rules"]

    def _get_required_tags(self, context_type: str) -> Set[str]:
        rules = self.metadata_rules["required_tags"]
        return set(rules.get("global", [])) | set(rules.get(context_type, []))

    def _get_allowed_tags(self, context_type: str) -> Set[str]:
        allowed = set(self.metadata_rules["optional_tags"].get("global", []))
        for section in self.metadata_rules["required_tags"].values():
            allowed.update(section)
        return allowed

    def validate_tags(self, tags: Dict, context: str, context_type: str) -> List[str]:
        if not isinstance(tags, dict):
            return [f"{context}: tags must be a dictionary"]
        errors: List[str] = []
        invalid = set(tags) - self._get_allowed_tags(context_type)
        if invalid:
            errors.append(f"{context}: unsupported tags found: {invalid}")
        missing = self._get_required_tags(context_type) - set(tags)
        if missing:
            errors.append(f"{context}: missing required tags: {missing}")
        return errors

    def _validate_views(self, config: Dict) -> List[str]:
        errors: List[str] = []
        for name, view in config.get("feature_views", {}).items():
            if not isinstance(view, dict):
                errors.append(f"Feature view '{name}' configuration must be a dictionary")
                continue
            missing = {"source_name", "entities", "schema"} - set(view)
            if missing:
                errors.append(f"Feature view '{name}' missing required fields: {missing}")
            if "tags" in view:
                errors.extend(
                    self.validate_tags(view["tags"], f"Feature view '{name}'", "feature_view")
                )
            for feature in view.get("schema", []):
                if "tags" in feature:
                    errors.extend(
                        self.validate_tags(
                            feature["tags"],
                            f"Feature '{feature['name']}' in view '{name}'",
                            "feature",
                        )
                    )
        return errors

    def _validate_services(self, config: Dict) -> List[str]:
        errors: List[str] = []
        views = config.get("feature_views", {})
        for name, svc in config.get("feature_services", {}).items():
            if not isinstance(svc, dict):
                errors.append(f"Feature service '{name}' configuration must be a dictionary")
                continue
            feats = svc.get("features")
            if feats is None:
                errors.append(f"Feature service '{name}' missing required field: features")
            elif not isinstance(feats, list):
                errors.append(f"Feature service '{name}' features must be a list")
            elif not feats:
                errors.append(f"Feature service '{name}' features list cannot be empty")
            else:
                for view_name in feats:
                    if view_name not in views:
                        errors.append(
                            f"Feature service '{name}' references non-existent "
                            f"feature view: {view_name}"
                        )
            if "tags" in svc:
                if not isinstance(svc["tags"], dict):
                    errors.append(f"Feature service '{name}' tags must be a dictionary")
                errors.extend(
                    self.validate_tags(svc["tags"], f"Feature service '{name}'", "feature_service")
                )
        return errors

    @classmethod
    def validate(cls, config: Dict, metadata_rules: Optional[Dict] = None) -> List[str]:
        v = cls(metadata_rules=metadata_rules)
        if not isinstance(config, dict):
            return ["Configuration must be a dictionary"]
        errors: List[str] = []
        errors.extend(v._validate_views(config))
        errors.extend(v._validate_services(config))
        return errors
