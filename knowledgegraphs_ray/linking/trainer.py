"""B2 fine-tune job skeleton — completes the corpora -> trainer -> scorer
seam (import-gated: torch/transformers are not in this container).

Reference: align/bertmap/bert_classifier.py:51-160 — BERTSynonymClassifier:
``AutoModelForSequenceClassification`` fine-tuned on the labelled
(annotation_a, annotation_b, 1|0) pairs of the text-semantics corpora for
``num_epochs`` (3.0 FIBO / 5.0 SNOMED, bertmap_main.py:134-136) at batch 32,
then served for prediction (-> ``linking.torch_scorer.TorchCrossEncoder``).

Ray-first design: the CORPUS is built distributed/driver-side
(``linking.corpora.text_semantics_corpora``); training itself is one
actor-sized job — fine-tuning a base BERT on ontology-scale pairs is a
single-GPU workload in the reference (docker-compose reserves exactly one
GPU), so the Ray-native shape is ONE ``@ray.remote(num_gpus=1)`` task, not a
data pipeline. ``train_synonym_classifier`` is that task's body; submit with
``ray.remote(train_synonym_classifier).options(num_gpus=1).remote(...)``.
"""

from __future__ import annotations

import json

try:  # pragma: no cover - torch absent in this container
    import torch  # noqa: F401
    from transformers import (  # noqa: F401
        AutoModelForSequenceClassification,
        AutoTokenizer,
        Trainer,
        TrainingArguments,
    )

    _TORCH = True
except ImportError:
    _TORCH = False


def load_corpus_pairs(path: str) -> tuple[list[tuple[str, str]], list[int]]:
    """Read a saved text-semantics corpus -> (sentence pairs, labels)."""
    with open(path) as f:
        corpus = json.load(f)
    pairs: list[tuple[str, str]] = []
    labels: list[int] = []
    for a, b, y in corpus.get("synonyms", []) + corpus.get("nonsynonyms", []):
        pairs.append((a, b))
        labels.append(int(y))
    return pairs, labels


def train_synonym_classifier(
    corpus_path: str,
    output_dir: str,
    *,
    base_model: str = "bert-base-uncased",
    num_epochs: float = 3.0,
    batch_size: int = 32,
    lr: float = 2e-5,
    seed: int = 42,
) -> str:
    """Fine-tune a sequence classifier on the corpus; returns the checkpoint
    directory (feed it to ``TorchCrossEncoder``). Raises if torch/transformers
    are unavailable (this container has neither — the seam is the artifact)."""
    if not _TORCH:
        raise RuntimeError(
            "torch/transformers not available in this environment; "
            "train_synonym_classifier is the documented B2 seam "
            "(bert_classifier.py:101-142) and needs a GPU image"
        )
    pairs, labels = load_corpus_pairs(corpus_path)
    tokenizer = AutoTokenizer.from_pretrained(base_model)
    model = AutoModelForSequenceClassification.from_pretrained(base_model, num_labels=2)
    enc = tokenizer(
        [a for a, _ in pairs],
        [b for _, b in pairs],
        truncation=True,
        padding=True,
        max_length=128,
    )

    class _Ds(torch.utils.data.Dataset):
        def __len__(self):
            return len(labels)

        def __getitem__(self, i):
            item = {k: torch.tensor(v[i]) for k, v in enc.items()}
            item["labels"] = torch.tensor(labels[i])
            return item

    args = TrainingArguments(
        output_dir=output_dir,
        num_train_epochs=num_epochs,
        per_device_train_batch_size=batch_size,
        learning_rate=lr,
        seed=seed,
        save_strategy="epoch",
        logging_steps=100,
    )
    Trainer(model=model, args=args, train_dataset=_Ds()).train()
    model.save_pretrained(output_dir)
    tokenizer.save_pretrained(output_dir)
    return output_dir
