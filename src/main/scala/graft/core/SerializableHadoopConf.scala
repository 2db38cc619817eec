package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Closure-shippable Hadoop [[Configuration]] (which is not
  * `Serializable` itself — it serializes via `Writable`). Capture the
  * DRIVER's resolved conf (`spark.sessionState.newHadoopConf()`, which
  * folds in every `spark.hadoop.*` session/cluster setting — s3a
  * credentials, fs.defaultFS) and read `.value` on the executor;
  * constructing a bare `new Configuration()` there would see only
  * executor-classpath XML and can resolve a different filesystem or
  * fail auth entirely. Same shape as Spark's internal
  * `org.apache.spark.util.SerializableConfiguration`; owned here so
  * graft never leans on a `@DeveloperApi` surface. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
