"""Migration of /root/reference/examples/fields.py: per-field transforms
on NESTED data (dotted + indexed paths) — here as vectorized Arrow
struct/list operations plus the path DSL.

Run: ``python examples/fields.py``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = [
    {
        "name": "Jeff",
        "age": 32,
        "job": {
            "title": "Lawyer",
            "company": {
                "name": "Good Lawyers Inc.",
                "website": "http://www.good-lawyers-inc.com",
            },
        },
        "friends": [
            {"name": "Annie", "age": 24},
            {"name": "Britta", "age": 28},
        ],
    }
]


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from chomper_ray.functions.paths import path_get_column

    ds = rd.from_items(DATA)

    def transform(t: pa.Table) -> pa.Table:
        # Item.name.filter(lambda name: '%s Winger' % name)
        t = t.set_column(t.schema.get_field_index("name"), "name",
                         pc.binary_join_element_wise(t["name"], " Winger", ""))
        # Item.age.filter(lambda age: age * 2)
        t = t.set_column(t.schema.get_field_index("age"), "age",
                         pc.multiply(t["age"], 2))
        # nested reads via the path DSL (writes = projected new columns;
        # Arrow structs are immutable, so nested "edits" surface as
        # top-level derived columns)
        t = t.append_column(
            "company_name",
            pc.utf8_ltrim(path_get_column(t, "job.company.name"), "God "))
        t = t.append_column(
            "first_friend",
            pc.binary_join_element_wise(
                path_get_column(t, "friends[0].name"), " Edison", ""))
        t = t.append_column(
            "second_friend",
            pc.binary_join_element_wise(
                path_get_column(t, "friends[1].name"), " Perry", ""))
        return t

    out = ds.map_batches(transform, batch_format="pyarrow").to_pandas()
    row = out.iloc[0]
    print(out[["name", "age", "company_name", "first_friend",
               "second_friend"]].to_string(index=False))
    assert row["name"] == "Jeff Winger" and row["age"] == 64
    assert row["first_friend"] == "Annie Edison"
    assert row["second_friend"] == "Britta Perry"
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
