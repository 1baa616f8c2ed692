"""The reference's tests/test_toy.py, on the graft Python on-ramp.

Three entities with Position+Velocity, a movement processor expressed
as SQL update rules, 10 steps of dt=0.1, then history + live-state
queries — plus the `graft_*` SQL functions and a read of the shared
parquet store to show the relational surface from Python.

Run (from the repo root, after `sbt package`):

    python3 python/example_toy.py [sf_dir]

The script finds the graft jar under target/scala-2.13 itself.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graft import Component, World, session, sql_processor


class Position(Component):
    x: float
    y: float


class Velocity(Component):
    vx: float
    vy: float


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jars = sorted(j for j in glob.glob(os.path.join(root, "target/scala-2.13/*.jar"))
                  if "-tests" not in j)
    classes = os.path.join(root, "target/scala-2.13/classes")
    cp = jars[-1] if jars else classes
    spark = session(jar=cp, app_name="graft-example-toy")
    spark.sparkContext.setLogLevel("WARN")

    # --- ECS: the test_toy scenario --------------------------------
    world = World.make(spark, simulation="toy_simulation_py")
    world.add_processor(sql_processor(
        "Movement", [Position, Velocity],
        {
            "position__x": "position__x + velocity__vx * {dt}",
            "position__y": "position__y + velocity__vy * {dt}",
        },
        priority=1,
    ))

    world.spawn(Position(x=0.0, y=0.0), Velocity(vx=1.0, vy=1.0))
    world.spawn(Position(x=10.0, y=5.0), Velocity(vx=2.0, vy=-1.0))
    world.spawn(Position(x=-5.0, y=-10.0), Velocity(vx=-0.5, vy=0.5))

    for _ in range(10):
        world.step(dt=0.1)

    hist = world.get_history(Position)
    assert hist, "history should return at least one archetype"
    total = sum(df.count() for df in hist.values())
    # 3 entities x (spawn frame + 10 steps)
    assert total == 33, f"expected 33 history rows, got {total}"

    live = world.query(Position, Velocity)
    rows = {r["entity_id"]: r for df in live.values()
            for r in df.collect()}
    assert len(rows) == 3, f"expected 3 live entities, got {len(rows)}"
    # entity 1 moved (0,0) -> (1.0, 1.0) over 10 steps of 0.1
    e1 = rows[1]
    assert abs(e1["position__x"] - 1.0) < 1e-9, e1
    assert abs(e1["position__y"] - 1.0) < 1e-9, e1
    print(f"[toy] history rows={total}, live entities={len(rows)}, "
          f"e1=({e1['position__x']:.2f},{e1['position__y']:.2f})")

    # --- graft_* SQL functions over the shared parquet store -------
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if os.path.isdir(sf_dir):
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
            .createOrReplaceTempView("lineitem")
        row = spark.sql("""
            SELECT graft_hll(l_partkey)            AS approx_parts,
                   graft_kll(l_quantity, 0.5D)     AS median_qty,
                   count(DISTINCT l_partkey)       AS exact_parts
            FROM lineitem
        """).collect()[0]
        err = abs(row["approx_parts"] - row["exact_parts"]) / row["exact_parts"]
        assert err < 0.05, f"HLL error {err:.3f} too large: {row}"
        print(f"[sql] graft_hll={row['approx_parts']} "
              f"(exact {row['exact_parts']}), median_qty={row['median_qty']}")
    else:
        print(f"[sql] skipped ({sf_dir} not present)")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
