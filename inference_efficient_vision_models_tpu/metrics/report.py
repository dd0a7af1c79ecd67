"""Result tables: pandas + tabulate console output and CSV side files,
matching the reference's reporting (`pruning/main.py:171-191`,
`quantization/main.py:316-332`)."""

from __future__ import annotations

import os
from typing import Dict, List


def summarize_folds(results: List[Dict], output_dir: str, logger, name: str = "results"):
    if not results:
        logger.warning("no results to summarize")
        return None
    import pandas as pd

    df = pd.DataFrame(results)
    try:
        from tabulate import tabulate

        logger.info("\n%s", tabulate(df, headers="keys", tablefmt="github", showindex=False))
    except ImportError:
        logger.info("\n%s", df.to_string(index=False))
    path = os.path.join(output_dir, f"{name}.csv")
    df.to_csv(path, index=False)
    logger.info("wrote %s", path)
    return df
