package graft.operators

import graft.SparkSpec

class FkAuditSpec extends SparkSpec {
  import spark.implicits._

  test("orphans, nulls, and totals are counted per edge") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(8L), None).toDF("ck")
    val r = FkAudit.auditOne("c->p", child, "ck", parent, "pk").head()
    assert(r.getString(0) === "c->p")
    assert(r.getLong(1) === 7L) // child_rows
    assert(r.getLong(2) === 1L) // null_keys
    assert(r.getLong(3) === 3L) // orphan_rows (9,9,8)
    assert(r.getLong(4) === 2L) // orphan_keys (9,8)
  }

  test("clean edge reports zero orphans; multi-edge union keeps order-free rows") {
    val parent = (1L to 10L).toDF("pk")
    val clean = (1L to 10L).flatMap(i => Seq(i, i)).toDF("ck")
    val dirty = Seq(1L, 99L).toDF("ck")
    val out = FkAudit.audit(Seq(
      ("clean", clean, "ck", parent, "pk"),
      ("dirty", dirty, "ck", parent, "pk")))
      .orderBy("fk").collect()
    assert(out(0).getLong(3) === 0L && out(0).getLong(4) === 0L)
    assert(out(1).getLong(3) === 1L && out(1).getLong(4) === 1L)
  }

  test("plan never joins child rows: the anti-join probes key counts") {
    val parent = (1L to 1000L).toDF("pk")
    val child = (1L to 5000L).map(i => i % 1200).toDF("ck")
    val plan = FkAudit.auditOne("e", child, "ck", parent, "pk")
      .queryExecution.executedPlan.toString
    // The aggregate below the anti join collapses rows to keys first.
    assert(plan.contains("LeftAnti"))
    val antiIdx = plan.indexOf("LeftAnti")
    assert(plan.substring(antiIdx).contains("HashAggregate"))
  }
}
