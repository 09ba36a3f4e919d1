package graft.operators

/** Hadoop committer options for the engine's own parquet writes.
  *
  * `data`: staged data files, sidecars and index stores — directories
  * whose completeness is decided by the table format's OWN commit
  * protocol (a metadata commit naming the files, a rename-swap, or a
  * partition glob), never by the `_SUCCESS` marker. For those the
  * marker is dead weight and task-commit renames (committer algorithm
  * v2) are safe: a failed job leaves orphan files in a directory the
  * format never committed, which vacuum/abandonment already handles.
  * On this box the two options together save ~0.06-0.1 s of driver-side
  * commit work per write job — at 100 TB the same options remove the
  * O(#files) sequential job-commit rename storm (the reason v2 exists;
  * object-store deployments swap in their manifest committers at the
  * same seam).
  *
  * `marker`: parquet datasets whose readers REQUIRE `_SUCCESS` as the
  * completeness signal (checkpoint datasets — see `resolveCkpt`): v2
  * still writes the marker at job commit, so only the redundant-rename
  * half of the saving applies there.
  */
private[graft] object WriteOpts {
  val data: Map[String, String] = Map(
    "mapreduce.fileoutputcommitter.algorithm.version" -> "2",
    "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false")

  val marker: Map[String, String] = Map(
    "mapreduce.fileoutputcommitter.algorithm.version" -> "2")
}
