package graft.source

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's golden assignment cases
  * (`/root/reference/kinesumer_test.go:231-316`).
  */
class ShardAssignmentSpec extends AnyFunSuite {

  test("5 shards over 3 clients → contiguous [2,1,2]") {
    val shards = (0 until 5).map(i => f"shardId-$i%012d")
    val split = ShardAssignment.split(shards, 3)
    assert(split.map(_.size) == Seq(2, 1, 2))
    assert(split.flatten == shards) // contiguous, order-preserving, complete
  }

  test("8 open shards over 3 clients → [3,2,3] (post-reshard)") {
    val shards = (5 until 13).map(i => f"shardId-$i%012d")
    val split = ShardAssignment.split(shards, 3)
    assert(split.map(_.size) == Seq(3, 2, 3))
    assert(split.flatten == shards)
  }

  test("single client owns everything") {
    assert(ShardAssignment.split(Seq("a", "b", "c"), 1) == Seq(Seq("a", "b", "c")))
  }

  test("assignment is a partition: complete, disjoint, contiguous (exhaustive)") {
    for (nShards <- 0 until 64; nClients <- 1 to 16) {
      val shards = (0 until nShards).map(i => s"s$i")
      val split = ShardAssignment.split(shards, nClients)
      assert(split.size == nClients)
      assert(split.flatten == shards,
        s"split not a contiguous partition for $nShards shards / $nClients clients")
    }
  }
}
