package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TableVersions
import graft.operators.TableVersions.{MergeDelete, MergeInsert, MergeUpdate}

/** General MERGE INTO over the versioned format: clause semantics
  * (ordered first-match-wins, SET * / INSERT * defaults, NOT MATCHED
  * BY SOURCE), the ANSI multiple-match rejection, commit-stats file
  * pruning of the rewrite set, the merge-on-read (deletion-vector)
  * path, CHECK enforcement on changed images only, and merges through
  * an active column mapping.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("tvm").toString + "/tbl"

  private def seed(root: String): Unit = {
    // 4 range-clustered files over k = 1..400
    val base = (1L to 400L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "name", "amt")
    TableVersions.append(spark, root,
      base.repartitionByRange(4, col("k")).sortWithinPartitions("k"))
  }

  test("update / delete / insert clauses with conditions, one commit") {
    val root = newRoot()
    seed(root)
    val source = Seq(
      (5L, "U", 999.0), (6L, "D", 0.0), (7L, "X", 0.0), // matched: upd, del, no clause
      (500L, "I", 111.0), (501L, "X", 0.0) // not matched: insert, filtered out
    ).toDF("k", "op", "newAmt")
    val v = TableVersions.merge(spark, root, source, Seq("k"),
      matched = Seq(
        MergeUpdate(Map("amt" -> "s.newAmt"), Some("s.op = 'U'")),
        MergeDelete(Some("s.op = 'D'"))),
      notMatched = Seq(MergeInsert(
        Map("k" -> "s.k", "name" -> "'new'", "amt" -> "s.newAmt"),
        Some("s.op = 'I'"))))
    assert(v.isDefined)
    val out = TableVersions.read(spark, root)
    assert(out.count() === 400) // -1 delete, +1 insert
    assert(out.filter($"k" === 5L).head().getDouble(2) === 999.0)
    assert(out.filter($"k" === 6L).isEmpty)
    assert(out.filter($"k" === 7L).head().getDouble(2) === 70.0) // no clause matched: kept
    val ins = out.filter($"k" === 500L).head()
    assert(ins.getString(1) === "new" && ins.getDouble(2) === 111.0)
    assert(out.filter($"k" === 501L).isEmpty) // insert condition false: dropped
  }

  test("UPDATE SET * and INSERT * take source columns by name, NULL-fill the rest") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "amt").coalesce(1))
    val source = Seq((2L, "B2"), (3L, "C3")).toDF("k", "name") // no amt column
    TableVersions.merge(spark, root, source, Seq("k"),
      matched = Seq(MergeUpdate()), notMatched = Seq(MergeInsert()))
    val out = TableVersions.read(spark, root).orderBy("k").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a", "B2", "C3"))
    assert(out(1).getDouble(2) === 2.0) // SET *: missing source col keeps target
    assert(out(2).isNullAt(2)) // INSERT *: missing source col inserts NULL
  }

  test("matched clauses are ordered first-match-wins; unconditional must be last") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq((1L, "a", 1.0)).toDF("k", "name", "amt").coalesce(1))
    val src = Seq((1L, "U", 50.0)).toDF("k", "op", "newAmt")
    // first clause matches and wins even though the second also would
    TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(
        MergeUpdate(Map("amt" -> "s.newAmt"), Some("s.op = 'U'")),
        MergeDelete(None)))
    assert(TableVersions.read(spark, root).head().getDouble(2) === 50.0)
    val e = intercept[IllegalArgumentException] {
      TableVersions.merge(spark, root, src, Seq("k"),
        matched = Seq(MergeDelete(None), MergeUpdate(Map("amt" -> "s.newAmt"))))
    }
    assert(e.getMessage.contains("unconditional"))
  }

  test("multiple source matches for one target row throw (ANSI rule)") {
    val root = newRoot()
    seed(root)
    val dup = Seq((5L, 1.0), (5L, 2.0)).toDF("k", "newAmt")
    val e = intercept[IllegalStateException] {
      TableVersions.merge(spark, root, dup, Seq("k"),
        matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt"))))
    }
    assert(e.getMessage.contains("more than one source row"))
    // …but duplicates are fine for an insert-only merge (no ambiguity)
    val v = TableVersions.merge(spark, root, dup, Seq("k"),
      notMatched = Seq(MergeInsert(Map("k" -> "s.k", "name" -> "'x'", "amt" -> "s.newAmt"))))
    assert(v.isDefined)
    assert(TableVersions.read(spark, root).count() === 400) // both matched: no insert
  }

  test("rewrite set prunes to touched files via commit stats") {
    val root = newRoot()
    seed(root)
    val before = TableVersions.commitState(spark, root).files.map(_.path).toSet
    assert(before.size === 4)
    // source touches only k=10..20 — one of the four range-clustered files
    val src = (10L to 20L).map(k => (k, k * 100.0)).toDF("k", "newAmt")
    TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt"))))
    val after = TableVersions.commitState(spark, root).files.map(_.path).toSet
    assert((before -- after).size === 1, "exactly one file rewrites")
    assert((before & after).size === 3, "three files carry by reference")
    val out = TableVersions.read(spark, root)
    assert(out.filter($"k".between(10L, 20L) && $"amt" === $"k" * 100.0).count() === 11)
    assert(out.count() === 400)
  }

  test("insert-only merge removes nothing and appends only unmatched rows") {
    val root = newRoot()
    seed(root)
    val before = TableVersions.commitState(spark, root).files.map(_.path).toSet
    val src = Seq((399L, "x"), (400L, "x"), (900L, "nine")).toDF("k", "name")
    TableVersions.merge(spark, root, src, Seq("k"),
      notMatched = Seq(MergeInsert()))
    val stA = TableVersions.commitState(spark, root)
    assert(before.subsetOf(stA.files.map(_.path).toSet), "no file removed")
    val out = TableVersions.read(spark, root)
    assert(out.count() === 401)
    assert(out.filter($"k" === 900L).head().getString(1) === "nine")
  }

  test("NOT MATCHED BY SOURCE update and delete") {
    val root = newRoot()
    TableVersions.append(spark, root,
      (1L to 10L).map(k => (k, s"v$k", k * 1.0)).toDF("k", "name", "amt").coalesce(1))
    // source names keys 1..4 as "still active"; 5..10 are by-source rows
    val src = (1L to 4L).map(k => Tuple1(k)).toDF("k")
    TableVersions.merge(spark, root, src, Seq("k"),
      notMatchedBySource = Seq(
        MergeDelete(Some("t.k > 8")), // 9, 10 delete
        MergeUpdate(Map("name" -> "'stale'")))) // 5..8 flag
    val out = TableVersions.read(spark, root).orderBy("k").collect()
    assert(out.length === 8)
    assert(out.map(_.getLong(0)).toSeq === (1L to 8L))
    assert(out.filter(_.getString(1) == "stale").map(_.getLong(0)).toSeq === (5L to 8L))
    // matched rows untouched
    assert(out.take(4).map(_.getString(1)).toSeq === (1L to 4L).map(k => s"v$k"))
  }

  test("merge-on-read: DV path tombstones changed rows without rewriting files") {
    val root = newRoot()
    seed(root)
    val before = TableVersions.commitState(spark, root).files.map(_.path).toSet
    val src = Seq((5L, 555.0), (105L, 556.0), (901L, 1.0)).toDF("k", "newAmt")
    val v = TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt"))),
      notMatched = Seq(MergeInsert(Map("k" -> "s.k", "name" -> "'i'", "amt" -> "s.newAmt"))),
      maxDvFraction = 0.2)
    assert(v.isDefined)
    val st = TableVersions.commitState(spark, root)
    assert(before.subsetOf(st.files.map(_.path).toSet), "no file rewritten")
    assert(st.dvs.size === 2, "both touched files carry a DV reference")
    val out = TableVersions.read(spark, root)
    assert(out.count() === 401)
    assert(out.filter($"k" === 5L).head().getDouble(2) === 555.0)
    assert(out.filter($"k" === 105L).head().getDouble(2) === 556.0)
    assert(out.filter($"k" === 901L).head().getString(1) === "i")
    // CDF of the merge commit: updates show delete(old) + insert(new)
    val cdf = TableVersions.readChanges(spark, root, v.get - 1, v.get)
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("delete", 0L) === 2)
    assert(byType.getOrElse("insert", 0L) === 3)
    // the fraction guard: a merge touching most rows falls back to rewrite
    val big = (1L to 400L).map(k => (k, 1.0)).toDF("k", "newAmt")
    TableVersions.merge(spark, root, big, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt"))), maxDvFraction = 0.2)
    val st2 = TableVersions.commitState(spark, root)
    assert(st2.dvs.isEmpty, "rewrite folds the DVs away")
    assert(TableVersions.read(spark, root)
      .filter($"k" <= 400L && $"amt" === 1.0).count() === 400)
  }

  test("CHECK constraints validate updated and inserted images, not kept rows") {
    val root = newRoot()
    TableVersions.append(spark, root,
      Seq((1L, "a", -5.0), (2L, "b", 2.0)).toDF("k", "name", "amt").coalesce(1))
    // constraint added AFTER a violating row landed: kept rows must not trip it
    TableVersions.addConstraint(spark, root, "amt_pos_on_write", "amt >= 0 OR k = 1")
    val ok = Seq((2L, 20.0)).toDF("k", "newAmt")
    assert(TableVersions.merge(spark, root, ok, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt")))).isDefined)
    val bad = Seq((2L, -1.0)).toDF("k", "newAmt")
    val e = intercept[IllegalArgumentException] {
      TableVersions.merge(spark, root, bad, Seq("k"),
        matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt"))))
    }
    assert(e.getMessage.contains("amt_pos_on_write"))
  }

  test("merge through an active column mapping uses logical names") {
    val root = newRoot()
    seed(root)
    TableVersions.renameColumn(spark, root, "amt", "price")
    val src = Seq((5L, 999.0), (900L, 9.0)).toDF("k", "price")
    TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(MergeUpdate(Map("price" -> "s.price"))),
      notMatched = Seq(MergeInsert(Map("k" -> "s.k", "name" -> "'n'", "price" -> "s.price"))))
    val out = TableVersions.read(spark, root)
    assert(out.columns.toSeq === Seq("k", "name", "price"))
    assert(out.filter($"k" === 5L).head().getDouble(2) === 999.0)
    assert(out.filter($"k" === 900L).head().getDouble(2) === 9.0)
    assert(out.count() === 401)
  }

  test("partitioned table: an update may move a row across partitions") {
    val root = newRoot()
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0)).toDF("k", "d", "amt")
    TableVersions.append(spark, root, df, partitionBy = Seq("d"))
    val src = Seq((2L, "2024-01-03", 20.0)).toDF("k", "d", "amt")
    TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(MergeUpdate()))
    val st = TableVersions.commitState(spark, root)
    val moved = TableVersions.read(spark, root).filter($"k" === 2L).head()
    assert(moved.getString(1) === "2024-01-03" && moved.getDouble(2) === 20.0)
    // partition metadata is exact: the moved row's file carries the new date
    assert(st.files.exists(_.part.get("d").contains("2024-01-03")))
    assert(TableVersions.readPartitions(spark, root,
      Map("d" -> "2024-01-03")).count() === 1)
  }

  test("empty source / no matching work is a visible no-op") {
    val root = newRoot()
    seed(root)
    val v0 = TableVersions.currentVersion(spark, root)
    val empty = Seq.empty[(Long, Double)].toDF("k", "newAmt")
    assert(TableVersions.merge(spark, root, empty, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt")))) === v0)
    // matched-only merge with zero matches: no version written
    val miss = Seq((9999L, 1.0)).toDF("k", "newAmt")
    assert(TableVersions.merge(spark, root, miss, Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.newAmt")))) === v0)
    assert(TableVersions.currentVersion(spark, root) === v0)
  }

  test("autoMerge: extra source columns append nullable, atomically with the merge") {
    val root = newRoot()
    seed(root)
    val src = Seq((5L, "U5", 50.5, "hi"), (900L, "N", 9.0, "new"))
      .toDF("k", "name", "amt", "note")
    // WITHOUT autoMerge the extra column is ignored (today's contract)
    TableVersions.merge(spark, root, src, Seq("k"),
      matched = Seq(MergeUpdate(Map.empty)), notMatched = Seq(MergeInsert(Map.empty)))
    assert(TableVersions.read(spark, root).columns.toSeq === Seq("k", "name", "amt"))

    // WITH autoMerge: `note` appends nullable; SET */INSERT * carry it
    val root2 = newRoot()
    seed(root2)
    val Some(v) = TableVersions.merge(spark, root2, src, Seq("k"),
      matched = Seq(MergeUpdate(Map.empty)), notMatched = Seq(MergeInsert(Map.empty)),
      autoMerge = true): @unchecked
    val out = TableVersions.read(spark, root2)
    assert(out.columns.toSeq === Seq("k", "name", "amt", "note"))
    assert(out.count() === 401)
    assert(out.filter($"k" === 5L).head().getString(3) === "hi")
    assert(out.filter($"k" === 900L).head().getString(3) === "new")
    assert(out.filter($"k" === 6L).head().isNullAt(3), "old rows null-fill")
    // the evolution landed IN the merge commit, not a separate version
    assert(TableVersions.commitState(spark, root2, Some(v - 1)).schema.get.fieldNames.toSeq
      === Seq("k", "name", "amt"), "prior version keeps the old schema")
    assert(TableVersions.history(spark, root2).count() === v + 1)

    // merge-on-read path evolves too (DV + appended images carry the column)
    val root3 = newRoot()
    seed(root3)
    val Some(_) = TableVersions.merge(spark, root3,
      Seq((7L, "U7", 7.7, 1L)).toDF("k", "name", "amt", "rank"), Seq("k"),
      matched = Seq(MergeUpdate(Map.empty)), maxDvFraction = 0.5,
      autoMerge = true): @unchecked
    assert(TableVersions.commitState(spark, root3).dvs.nonEmpty, "DV path taken")
    val o3 = TableVersions.read(spark, root3)
    assert(o3.columns.toSeq === Seq("k", "name", "amt", "rank"))
    assert(o3.filter($"k" === 7L).head().getLong(3) === 1L)
    assert(o3.filter($"k" === 8L).head().isNullAt(3))

    // names resolve per the session's (default case-INsensitive)
    // analysis: a source column differing only in case from a table
    // column is the SAME column, not a new one — before the fix 'AMT'
    // committed as a second column and every later reference to amt
    // was ambiguous
    val root4 = newRoot()
    seed(root4)
    val Some(_) = TableVersions.merge(spark, root4,
      Seq((5L, "U5c", 55.5), (901L, "Nc", 9.1)).toDF("k", "name", "AMT"), Seq("k"),
      matched = Seq(MergeUpdate(Map("amt" -> "s.AMT"))),
      notMatched = Seq(MergeInsert(Map.empty)), autoMerge = true): @unchecked
    val out4 = TableVersions.read(spark, root4)
    assert(out4.columns.toSeq === Seq("k", "name", "amt"),
      "a case-only variant must not evolve a duplicate-modulo-case column")
    assert(out4.filter($"k" === 5L).head().getDouble(2) === 55.5)
    assert(out4.filter($"k" === 901L).head().getDouble(2) === 9.1)

    // resurrection guard: a dropped column's name cannot auto-evolve back
    TableVersions.dropColumn(spark, root2, "note")
    val e = intercept[IllegalArgumentException] {
      TableVersions.merge(spark, root2,
        Seq((901L, "X", 1.0, "boo")).toDF("k", "name", "amt", "note"), Seq("k"),
        notMatched = Seq(MergeInsert(Map.empty)), autoMerge = true)
    }
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
  }
}
