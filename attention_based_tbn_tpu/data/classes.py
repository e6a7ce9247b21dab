"""Epic-Kitchens class metadata (verb/noun/action tables).

Mirrors reference core/dataset/epic_class.py: loads EPIC_verb_classes.csv /
EPIC_noun_classes.csv (+ optional action table), exposes exploded synonym
frames and (verb, noun) -> "verb_id,noun_id" action-id lookup.
"""

from __future__ import annotations

import ast
import os
from typing import Optional

import pandas as pd


class EpicClasses:
    def __init__(self, annotation_dir: str):
        self.annotation_dir = annotation_dir
        self._class_keys: dict = {}
        self.verb_df = self._load("EPIC_verb_classes.csv", "verbs", "verb_id")
        self.noun_df = self._load("EPIC_noun_classes.csv", "nouns", "noun_id")
        action_path = os.path.join(annotation_dir, "action_id_to_name.pkl")
        self.action_names = (
            pd.read_pickle(action_path) if os.path.exists(action_path) else None
        )

    def _load(self, filename: str, list_col: str, id_col: str) -> pd.DataFrame:
        path = os.path.join(self.annotation_dir, filename)
        table = pd.read_csv(path)
        # the canonical (un-exploded) class-name list, indexable by class id
        # (reference epic_class.py:12-18 `verbs` / :33-38 `nouns` properties
        # return the csv's class_key column)
        if "class_key" in table.columns:
            self._class_keys[list_col] = table["class_key"].tolist()
        # EPIC ships the synonym list as a stringified python list; explode it
        # so each synonym maps to its class id (reference epic_class.py:24-45).
        cols = table.columns.tolist()
        id_name = cols[0]
        syn_name = next((c for c in cols if c in (list_col, "verbs", "nouns")), None)
        if syn_name is None:
            raise ValueError(f"No synonym column in {filename}: {cols}")
        table = table.rename(columns={id_name: id_col})
        table[syn_name] = table[syn_name].apply(
            lambda v: ast.literal_eval(v) if isinstance(v, str) and v.startswith("[") else [v]
        )
        exploded = table.explode(syn_name).rename(columns={syn_name: list_col})
        return exploded.reset_index(drop=True)

    def _keys_or_raise(self, list_col: str):
        # The reference raises AttributeError when the csv lacks class_key
        # (epic_class.py accesses df.class_key unconditionally); fail loudly
        # rather than silently returning an empty table.
        if list_col not in self._class_keys:
            raise AttributeError(
                f"EpicClasses.{list_col}: the {list_col[:-1]} class csv in "
                f"{self.annotation_dir} has no 'class_key' column, so "
                f"class-id-indexed names are unavailable"
            )
        return self._class_keys[list_col]

    @property
    def verbs(self):
        """Class-id-indexed verb names (reference epic_class.py:12-18)."""
        return self._keys_or_raise("verbs")

    @property
    def nouns(self):
        """Class-id-indexed noun names (reference epic_class.py:33-38)."""
        return self._keys_or_raise("nouns")

    def verb_id(self, verb: str) -> int:
        return int(self.verb_df.query("verbs == @verb")[
            "verb_id"
        ].values[0])

    def noun_id(self, noun: str) -> int:
        return int(self.noun_df.query("nouns == @noun")["noun_id"].values[0])

    def action_id_string(self, verb: str, noun: str) -> str:
        return f"{self.verb_id(verb)},{self.noun_id(noun)}"

    def action_name(self, action_id: int) -> Optional[str]:
        if self.action_names is None:
            return None
        return self.action_names[action_id]
