"""Ray stage for the page-layout table recognizer.

Stage shape matches the reference's PDF path (one stateless per-row
geometric transform inside the document→XHTML extraction stage,
kg_text_to_ttl/text_to_turtle_runner.py:131-141): rows carry
``words`` (list of [x0,y0,x1,y1,text] structs) and ``drawings``
(list of [x0,y0,x1,y1]); output adds an ``xhtml`` column that the normal
HTML→text + TripleExtractor stages consume downstream.
"""

from __future__ import annotations

import pandas as pd

from cmc_knowledge_graph_text2ttl_ray.functions.page_layout import (
    LayoutParams,
    recognize_doc,
)

__all__ = ["recognize_layout"]


def recognize_layout(ds, words_col: str = "words", drawings_col: str = "drawings",
                     out_col: str = "xhtml", params: LayoutParams | None = None):
    """Dataset of page-primitive rows → same rows + recognized XHTML.

    One row = one document (list of pages); pure geometry, so this runs as
    stateless tasks — no actor pool needed.
    """
    p = params or LayoutParams()

    def run(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for words, drawings in zip(df[words_col], df[drawings_col]):
            pages = [(words, drawings)]
            out.append(recognize_doc(pages, p))
        df = df.copy()
        df[out_col] = out
        return df

    return ds.map_batches(run, batch_format="pandas")
