"""Pipeline configuration — the reference's user-extension surface (§2.14).

Reference: A_Coordinator/Config.java:84-120,202-328 (per-use-case JSON:
mapper choice, thresholds, turnAttributesToClasses, includeInverseAxioms,
abbreviation expansion on/off) and align/bertmap/default_config.yaml.

One dataclass, loadable from JSON/dict, threaded through the pipelines.
The three extension surfaces match the reference: (1) this config, (2) extra
rule hooks (``extra_rules`` callables rewriting the compiled RuleTable —
FormatSpecificRules analogue), (3) the scorer plug (``scorer_cls`` — swap the
surrogate for a HF-checkpoint-backed class with the same __call__ shape).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any, Callable


@dataclass
class PipelineConfig:
    # rule extraction (Config.java turnAttributesToClasses / includeInverseAxioms)
    attrs_to_classes: bool = False
    include_inverse: bool = False
    # mapper choice: "exact" (ExactMapper) or "scored" (BERTMap path)
    mapper: str = "scored"
    # selection thresholds (MappingSelection BES/PJ; bertmap kappa/lambda)
    bes_hi: float = 0.85
    bes_lo: float = 0.60
    pj_hi: float = 0.5
    kappa: float = 0.85
    lam: float = 0.90
    depth_threshold: int = 3
    # candidate generation (default_config.yaml:73-74)
    num_raw_candidates: int = 200
    num_best_predictions: int = 20
    # abbreviation expansion on/off (Config.java applyMedicalAbbreviationExpansion)
    expand_abbreviations: bool = False
    # abbreviation dictionary (full-form vocabulary), the MedicalDictionary
    # analogue; required when expand_abbreviations is on
    abbrev_dictionary: dict | None = None
    # scorer stage sizing
    scorer_concurrency: int = 2
    scorer_batch_size: int = 4096
    # context-aware transcript linking (X2): ±k-turn window blended into the
    # candidate score; None = plain per-mention linking
    context_window: int | None = None
    context_weight: float = 0.3
    # extension hooks
    extra_rules: list[Callable] = field(default_factory=list)
    scorer_cls: type | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    @classmethod
    def from_json(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d.pop("extra_rules", None)
        d.pop("scorer_cls", None)
        return d
