package graft.source

/** The reference's consumer-group shard assignment, as a pure function.
  *
  * Kinesumer splits a stream's sorted shard list contiguously across the
  * sorted alive-client list: client `idx` of `n` owns
  * `[round(idx * r), round((idx+1) * r))` with `r = numShards / n`
  * (`/root/reference/syncclient.go:113-117`). Golden cases pinned by the
  * reference's own tests: 5 shards / 3 clients → [2,1,2]; 8 open shards /
  * 3 clients → [3,2,3] (`/root/reference/kinesumer_test.go:231-316`).
  *
  * In the Spark engine the driver plans every shard each micro-batch, so
  * no client-side assignment is needed at runtime; this function exists for
  * semantic parity (and for sizing dashboards that mirror a kinesumer
  * deployment's per-client load).
  */
object ShardAssignment {

  /** Shards owned by client `idx` of `n` (clients sorted ascending by id,
    * leader = index 0 — `/root/reference/syncclient.go:79-86`).
    */
  def assignRange(numShards: Int, idx: Int, n: Int): Range = {
    require(n > 0 && idx >= 0 && idx < n, s"bad client index $idx of $n")
    val r = numShards.toDouble / n
    val from = math.round(idx * r).toInt
    val until = math.round((idx + 1) * r).toInt
    from until until
  }

  /** Full split: shard ids per client, preserving shard order. */
  def split[A](shards: Seq[A], n: Int): Seq[Seq[A]] =
    (0 until n).map(i => assignRange(shards.size, i, n).map(shards))
}
