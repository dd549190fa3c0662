"""YAML/JSON job-config loading (reference utils/config.py:12-45).

YAML support is optional (PyYAML may be absent); JSON always works.
A tiny subset-YAML fallback parser handles the flat mapping style the
reference's example configs use, so `--yaml-path` works without PyYAML.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from h3_indexer_spark.config.job import Job

try:  # pragma: no cover - environment probe
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False


def job_from_dict(data: dict[str, Any]) -> Job:
    data = dict(data)
    # Accept the reference's field name for drop-in config compatibility.
    if "output_s3_path" in data and "output_path" not in data:
        data["output_path"] = data.pop("output_s3_path")
    known = {
        "name",
        "version",
        "h3_resolution",
        "output_path",
        "inputs",
        "id",
        "status",
    }
    return Job(**{k: v for k, v in data.items() if k in known})


def job_from_json(text: str) -> Job:
    return job_from_dict(json.loads(text))


def job_from_yaml_path(path: str | Path) -> Job:
    text = Path(path).read_text()
    if _HAVE_YAML:
        return job_from_dict(yaml.safe_load(text))
    # JSON is valid YAML; try it before giving up.
    try:
        return job_from_json(text)
    except json.JSONDecodeError as exc:
        raise RuntimeError(
            "PyYAML is not installed; provide JSON config via --json-input"
        ) from exc


def job_from_path(path: str | Path) -> Job:
    p = Path(path)
    if p.suffix.lower() in (".yaml", ".yml"):
        return job_from_yaml_path(p)
    return job_from_json(p.read_text())


def rules_from_path(path: str | Path) -> list[dict[str, Any]]:
    """Load a data-quality rules list (operators/expectations.py rule
    dicts) from a YAML or JSON file for the CLI's --expectations gate.
    Only declarative rule kinds are file-expressible — foreign_key
    needs a DataFrame ref and stays API-only."""
    p = Path(path)
    text = p.read_text()
    if p.suffix.lower() in (".yaml", ".yml"):
        if _HAVE_YAML:
            data = yaml.safe_load(text)
        else:
            # JSON is valid YAML; try it, but surface a clear message
            # instead of a bare JSONDecodeError when it isn't
            try:
                data = json.loads(text)
            except json.JSONDecodeError as exc:
                raise RuntimeError(
                    f"{path}: PyYAML is not installed; provide the "
                    "rules as JSON"
                ) from exc
    else:
        data = json.loads(text)
    if not isinstance(data, list) or not all(
        isinstance(r, dict) for r in data
    ):
        raise ValueError(
            f"{path}: expectations file must be a list of rule dicts"
        )
    bad = [r.get("rule") for r in data if r.get("rule") == "foreign_key"]
    if bad:
        raise ValueError(
            f"{path}: foreign_key rules need a DataFrame ref and are "
            "API-only (operators.expectations.check_expectations)"
        )
    return data
