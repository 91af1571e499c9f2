package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable per-group Bloom filter (`Aggregator[String, BloomFilter,
  * Array[Byte]]`) — the building block for per-FILE membership
  * sidecars, where `df.stat.bloomFilter` can only build one filter for
  * the whole frame.
  *
  * Values are fed as strings (callers cast; one canonical
  * representation keeps build and probe sides aligned). Nulls don't
  * enter the filter — membership of NULL is never asked of a bloom
  * (SQL `=` can't select it anyway).
  *
  * Scale shape: partial aggregation means each task builds local
  * filters and only the OR-merged bit arrays cross the shuffle —
  * O(groups × bits), independent of row count. `expectedItems` sizes
  * the bit array per GROUP (per file for the sidecar use), so keep it
  * at the expected per-file distinct count, not the table's.
  */
class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, v: String): BloomFilter = {
    if (v != null) b.putString(v)
    b
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  // BloomFilterImpl is java-Serializable by contract (it defines
  // writeObject/readObject); kryo would serialize internals it hides.
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAgg {
  /** Probe-side twin of [[BloomAgg.finish]]. */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
